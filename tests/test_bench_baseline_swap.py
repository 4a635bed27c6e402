"""Module-swap isolation for ``bench.py --baseline-tree``.

The round-7 review caught the comparison silently running head-vs-head:
registry wrappers import their operators FUNCTION-LOCALLY, and a
relative import at call time resolves through sys.modules — so with
HEAD's modules live, a baseline closure executes HEAD operator code.
These tests pin the fix (``_swap_in`` bracketing every baseline call)
against a synthetic baseline tree whose registry reports which tree's
module actually executed.
"""

from __future__ import annotations

import os
import sys
import textwrap

import bench
import neo4j_database_to_data_importer_package_spark.registry  # noqa: F401  (ensures the real package is live)


def _make_fake_tree(root: str, marker: str) -> None:
    pkg = os.path.join(root, "neo4j_database_to_data_importer_package_spark")
    os.makedirs(pkg)
    with open(os.path.join(pkg, "__init__.py"), "w") as f:
        f.write("")
    with open(os.path.join(pkg, "impl.py"), "w") as f:
        f.write(f"MARKER = {marker!r}\n")
    with open(os.path.join(pkg, "registry.py"), "w") as f:
        f.write(textwrap.dedent(
            """
            def probe(spark, sf_dir):
                # function-local relative-style import: resolves through
                # sys.modules at CALL time — the exact pattern the real
                # registry wrappers use
                from neo4j_database_to_data_importer_package_spark import impl
                return impl.MARKER

            QUERIES = {"probe": probe}
            """
        ))


def test_swap_in_resolves_function_local_imports(tmp_path):
    base_tree = str(tmp_path / "base")
    os.makedirs(base_tree)
    _make_fake_tree(base_tree, "baseline-tree")

    head_mods = bench._pkg_modules()
    assert head_mods, "real package must be imported by the bench module"
    queries, base_mods = bench._load_tree_registry(base_tree)
    # loader restored HEAD: the real registry is live again
    import neo4j_database_to_data_importer_package_spark.registry as real_reg

    assert "probe" not in real_reg.QUERIES
    # without the swap, the fake closure would resolve `impl` against
    # HEAD's package (no impl module -> ImportError), which is exactly
    # the head-vs-head failure mode inverted
    bench._swap_in(base_mods)
    try:
        assert queries["probe"](None, None) == "baseline-tree"
    finally:
        base_mods.update(bench._pkg_modules())
        bench._swap_in(head_mods)
    # HEAD restored: the real registry still resolves
    import neo4j_database_to_data_importer_package_spark.registry as real_reg2

    assert real_reg2.QUERIES


def test_loader_restores_head_on_missing_tree(tmp_path):
    head_mods = bench._pkg_modules()
    try:
        bench._load_tree_registry(str(tmp_path / "nonexistent"))
    except ImportError:
        pass
    else:  # pragma: no cover
        raise AssertionError("expected ImportError for a tree without the package")
    # HEAD modules must be back regardless
    assert set(bench._pkg_modules()) == set(head_mods)
    from neo4j_database_to_data_importer_package_spark import registry as r

    assert r.QUERIES


def test_lazy_head_submodule_survives_baseline_call(tmp_path):
    """Round-11 harness-bias regression pin: a HEAD submodule imported
    lazily AFTER the head snapshot was taken (the registry pattern —
    operators pulled via function-level imports during the first query
    construction) must still be in sys.modules, as the SAME object,
    after a baseline call. Before the fix the swap restored the stale
    snapshot, so the submodule was re-imported from disk inside head's
    next timed window — a stable ~2x phantom regression on
    construction-heavy sub-second queries for byte-identical trees."""
    base_tree = str(tmp_path / "base")
    os.makedirs(base_tree)
    _make_fake_tree(base_tree, "baseline-tree")
    queries, base_mods = bench._load_tree_registry(base_tree)

    head_mods = bench._pkg_modules()
    lazy_name = "neo4j_database_to_data_importer_package_spark.operators.mixing"
    sys.modules.pop(lazy_name, None)
    head_mods.pop(lazy_name, None)
    import importlib

    lazy_mod = importlib.import_module(lazy_name)  # lazily imported post-snapshot
    assert lazy_name not in head_mods  # genuinely missing from the snapshot

    in_baseline = bench._baseline_runner(head_mods, base_mods)
    assert in_baseline(lambda: queries["probe"](None, None)) == "baseline-tree"

    assert sys.modules.get(lazy_name) is lazy_mod, (
        "lazily-imported head submodule was dropped by the baseline swap "
        "(it would be re-imported inside the next timed window)"
    )
