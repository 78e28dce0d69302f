"""spark-submit entry script. Usage:

    spark-submit --py-files dist/spark_pit.zip tools/run_job.py \
        --events <parquet> --out <dir> [...]

The zip from tools/build_pyfiles.py puts spark_pit on every executor's
PYTHONPATH; this script is driver-side plumbing only.
"""

import os
import sys

# allow plain `python tools/run_job.py` in the sandbox (repo-root import)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_pit.job import main  # noqa: E402

if __name__ == "__main__":
    main()
