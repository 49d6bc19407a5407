"""docs/catalog.md staleness gate: the committed catalog must equal
the regenerated one byte-for-byte, so registering a query without
refreshing the navigation layer fails CI (run
``python scripts/gen_catalog.py`` after adding queries)."""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_catalog_is_fresh():
    spec = importlib.util.spec_from_file_location(
        "gen_catalog", os.path.join(REPO, "scripts", "gen_catalog.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    expected = mod.generate()
    path = os.path.join(REPO, "docs", "catalog.md")
    assert os.path.exists(path), "docs/catalog.md missing — run scripts/gen_catalog.py"
    actual = open(path, encoding="utf-8").read()
    assert actual == expected, (
        "docs/catalog.md is stale — run `python scripts/gen_catalog.py`"
    )


def test_catalog_covers_registry():
    from python_plugins_spark.queries import QUERIES

    text = open(
        os.path.join(REPO, "docs", "catalog.md"), encoding="utf-8"
    ).read()
    missing = [n for n in QUERIES if f"`{n}`" not in text]
    assert not missing, missing
