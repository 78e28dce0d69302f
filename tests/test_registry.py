"""Registry hygiene guards.

Python dict literals silently keep the last value for a duplicated key, so a
148-entry registry can shadow an entry without any visible failure.  These
tests parse the source with `ast` to catch literal-level duplicates that the
runtime dict can never reveal.
"""
import ast
import pathlib

QUERIES_PATH = pathlib.Path(__file__).resolve().parents[1] / "spark_pit" / "queries.py"


def _literal_dict_keys(module_ast, name):
    for node in ast.walk(module_ast):
        if isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            if node.target.id == name and isinstance(node.value, ast.Dict):
                return [k.value for k in node.value.keys if isinstance(k, ast.Constant)]
        if isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name) and tgt.id == name and isinstance(node.value, ast.Dict):
                    return [k.value for k in node.value.keys if isinstance(k, ast.Constant)]
    raise AssertionError(f"dict literal {name} not found in queries.py")


def test_queries_literal_has_no_duplicate_keys():
    tree = ast.parse(QUERIES_PATH.read_text())
    keys = _literal_dict_keys(tree, "QUERIES")
    dupes = sorted({k for k in keys if keys.count(k) > 1})
    assert not dupes, f"duplicate QUERIES keys shadow earlier entries: {dupes}"


def test_oracles_literal_has_no_duplicate_keys():
    tree = ast.parse(QUERIES_PATH.read_text())
    keys = _literal_dict_keys(tree, "ORACLES")
    dupes = sorted({k for k in keys if keys.count(k) > 1})
    assert not dupes, f"duplicate ORACLES keys shadow earlier entries: {dupes}"


def test_every_query_key_is_unique_and_oracles_subset():
    from spark_pit.queries import ORACLES, QUERIES

    missing = sorted(set(ORACLES) - set(QUERIES))
    assert not missing, f"ORACLES entries without a QUERIES twin: {missing}"


def test_gate_order_is_a_permutation_of_the_registry():
    """GATE_ORDER rebuilds QUERIES; a key missing from it would silently
    DROP that query from the driver contract (dict-comprehension rebuild),
    so the permutation property is load-bearing."""
    tree = ast.parse(QUERIES_PATH.read_text())
    literal_keys = _literal_dict_keys(tree, "QUERIES")

    from spark_pit.queries import GATE_ORDER, QUERIES

    assert sorted(GATE_ORDER) == sorted(literal_keys)
    assert list(QUERIES) == GATE_ORDER
    assert len(GATE_ORDER) == len(set(GATE_ORDER))


def test_gate_window_is_oracle_backed():
    """The driver's strong (value-hash) gate evaluates the first 50
    queries; rows-only entries there would downgrade the evidence."""
    from spark_pit.queries import GATE_ORDER, ORACLES

    weak = [k for k in GATE_ORDER[:50] if k not in ORACLES]
    assert not weak, f"rows-only queries inside the gated window: {weak}"
