"""Regression pin for the gate's stale-evidence re-entry logic
(__spark_entry__._evidenced / _ordered).

The driver's ~50-row correctness window is scheduled by
__spark_entry__: never-evidenced queries first, then queries whose
prior green evidence went STALE because a module they depend on
changed since the round that produced the evidence (git-blob
comparison against the artifact's commit).  These tests build a REAL
throwaway git repo (not mocks of git) with a synthetic CORRECTNESS
artifact and verify that:

- unchanged module        → evidence stays valid (query sits last),
- edited module           → query re-enters the window as stale,
- edited intra-package dep → same (the _tracked_paths attribution),
- a never-evidenced query  → strictly precedes the stale one,
- comment/docstring-only edits → evidence STAYS valid (the r05
  AST-normalized comparison: only behavior-bearing changes cascade).
"""

from __future__ import annotations

import json
import os
import subprocess

import pytest

import __spark_entry__ as gate

MOD_REL = os.path.join("go_map_reduce_spark", "operators", "fakemod.py")
DEP_REL = os.path.join("go_map_reduce_spark", "operators", "fakedep.py")

MOD_SRC = (
    "from go_map_reduce_spark.operators.fakedep import helper\n"
    "def the_query(spark, sf_dir):\n"
    "    return helper()\n"
)
DEP_SRC = "def helper():\n    return 42\n"


def _git(cwd, *args):
    subprocess.run(
        ["git", "-C", cwd, *args], check=True, capture_output=True, text=True
    )


@pytest.fixture()
def fake_repo(tmp_path, monkeypatch):
    """Throwaway git repo with one evidenced query ('fakeq') whose
    implementation is fakemod.py (importing fakedep.py), committed
    together with a green CORRECTNESS_r01.json row."""
    repo = tmp_path / "repo"
    os.makedirs(repo / "go_map_reduce_spark" / "operators")
    (repo / MOD_REL).write_text(MOD_SRC)
    (repo / DEP_REL).write_text(DEP_SRC)
    (repo / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                "fakeq": {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": True,
                    "spark_rows": 1,
                    "oracle_rows": 1,
                    "err": None,
                }
            }
        )
    )
    _git(repo, "init", "-q")
    _git(repo, "-c", "user.email=t@t", "-c", "user.name=t", "add", "-A")
    _git(
        repo, "-c", "user.email=t@t", "-c", "user.name=t",
        "commit", "-q", "-m", "round 1 artifacts",
    )

    # Point the gate at the throwaway repo and at a query registry whose
    # single entry maps to fakemod.py.  _module_relpath resolves via
    # sys.modules, so substitute it directly (the path mapping is not
    # what's under test — the git staleness comparison is).
    monkeypatch.setattr(gate, "_HERE", str(repo))
    monkeypatch.setattr(
        gate, "_module_relpath", lambda name: MOD_REL if name == "fakeq" else None
    )
    _clear_caches()
    yield repo
    _clear_caches()


def _clear_caches():
    for val in vars(gate).values():
        if hasattr(val, "cache_clear"):
            val.cache_clear()


def test_unchanged_module_keeps_evidence_valid(fake_repo):
    valid, stale = gate._evidenced()
    assert "fakeq" in valid and "fakeq" not in stale
    # and _ordered puts the evidenced query LAST, behind unevidenced
    order = list(gate._ordered({"fakeq": 1, "neverq": 2}))
    assert order == ["neverq", "fakeq"]


def test_edited_module_reenters_window(fake_repo):
    (fake_repo / MOD_REL).write_text(MOD_SRC + "\nEXTRA = 1  # new binding\n")
    _clear_caches()
    valid, stale = gate._evidenced()
    assert "fakeq" in stale and "fakeq" not in valid
    # stale re-enters the window but NEVER crowds out a brand-new query
    order = list(gate._ordered({"fakeq": 1, "neverq": 2}))
    assert order == ["neverq", "fakeq"]


def test_edited_intra_package_dep_reenters_window(fake_repo):
    """fakemod.py is untouched; only the module it imports changed —
    the _tracked_paths source scan must attribute the edit to fakeq."""
    (fake_repo / DEP_REL).write_text("def helper():\n    return 43\n")
    _clear_caches()
    _valid, stale = gate._evidenced()
    assert "fakeq" in stale


def test_reverting_the_edit_restores_validity(fake_repo):
    (fake_repo / MOD_REL).write_text(MOD_SRC + "\nEXTRA = 1\n")
    _clear_caches()
    assert "fakeq" in gate._evidenced()[1]
    (fake_repo / MOD_REL).write_text(MOD_SRC)
    _clear_caches()
    assert "fakeq" in gate._evidenced()[0]


def test_gate_priority_names_are_all_registered():
    """A typo'd name in _GATE_PRIORITY would silently forfeit a window
    row (the gate filters on membership); pin that every priority name
    resolves to a registered query. events_transform_with_state is the
    one environment-gated registration (it needs a protobuf runtime —
    vendored since r07, so present here, but legally absent on a
    machine where neither site-packages nor vendor/ provides one); it
    may be missing exactly when its gate says so."""
    from go_map_reduce_spark.registry import QUERIES
    from go_map_reduce_spark.streaming.stateful import _protobuf_available

    env_gated = set()
    if not _protobuf_available():
        env_gated.add("events_transform_with_state")
    missing = [
        n for n in gate._GATE_PRIORITY
        if n not in QUERIES and n not in env_gated
    ]
    assert not missing, missing
    # and the priority list has no duplicates (a dup would double-count
    # its window slot in planning)
    assert len(gate._GATE_PRIORITY) == len(set(gate._GATE_PRIORITY))


def test_stale_priority_names_are_all_registered():
    """Same contract as _GATE_PRIORITY: a typo'd _STALE_PRIORITY name
    silently loses its deliberate re-gate position."""
    from go_map_reduce_spark.registry import QUERIES

    missing = [n for n in gate._STALE_PRIORITY if n not in QUERIES]
    assert not missing, missing
    assert len(gate._STALE_PRIORITY) == len(set(gate._STALE_PRIORITY))


def test_stale_tier_orders_by_stale_priority(fake_repo, monkeypatch):
    """With several queries stale, _ordered must sort the stale tier by
    _STALE_PRIORITY (listed names first, in list order) while
    never-evidenced still lead everything."""
    # evidence two queries off the same (edited) module
    (fake_repo / "CORRECTNESS_r01.json").write_text(
        __import__("json").dumps(
            {
                name: {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": True,
                    "spark_rows": 1,
                    "oracle_rows": 1,
                    "err": None,
                }
                for name in ("stale_low", "stale_high")
            }
        )
    )
    _git(
        fake_repo, "-c", "user.email=t@t", "-c", "user.name=t",
        "add", "-A",
    )
    _git(
        fake_repo, "-c", "user.email=t@t", "-c", "user.name=t",
        "commit", "-q", "-m", "two rows",
    )
    (fake_repo / MOD_REL).write_text(MOD_SRC + "\nEXTRA = 1\n")
    monkeypatch.setattr(
        gate,
        "_module_relpath",
        lambda name: MOD_REL if name in ("stale_low", "stale_high") else None,
    )
    monkeypatch.setattr(gate, "_STALE_PRIORITY", ["stale_high"])
    _clear_caches()
    order = list(
        gate._ordered({"stale_low": 1, "neverq": 2, "stale_high": 3})
    )
    assert order == ["neverq", "stale_high", "stale_low"]


def test_comment_and_docstring_edits_keep_evidence_valid(fake_repo):
    """A doc polish must not invalidate evidence: add a module
    docstring, a function docstring, comments, and reformat whitespace
    — the AST-normalized comparison sees identical behavior."""
    (fake_repo / MOD_REL).write_text(
        '"""New module docstring."""\n'
        "from go_map_reduce_spark.operators.fakedep import helper\n"
        "\n"
        "\n"
        "def the_query(spark, sf_dir):\n"
        '    """Documented now."""\n'
        "    # a clarifying comment\n"
        "    return helper()\n"
    )
    _clear_caches()
    valid, stale = gate._evidenced()
    assert "fakeq" in valid and "fakeq" not in stale


def test_string_literal_changes_still_cascade(fake_repo):
    """Oracle SQL lives in plain string literals (not docstrings) —
    changing one IS a behavior change and must re-enter the window."""
    (fake_repo / MOD_REL).write_text(
        "from go_map_reduce_spark.operators.fakedep import helper\n"
        'ORACLE = "SELECT 2"\n'
        "def the_query(spark, sf_dir):\n"
        "    return helper()\n"
    )
    _clear_caches()
    _valid, stale = gate._evidenced()
    assert "fakeq" in stale


def test_docstring_citation_creates_no_dependency_edge(fake_repo):
    """This repo's docstrings cite module paths liberally; a CITATION
    (docstring/comment mention of go_map_reduce_spark.operators.fakedep2)
    must not create a dependency edge — editing the cited module leaves
    the evidence valid. A real import (fakedep) still cascades."""
    dep2 = fake_repo / "go_map_reduce_spark" / "operators" / "fakedep2.py"
    dep2.write_text("def other():\n    return 1\n")
    (fake_repo / MOD_REL).write_text(
        '"""Cites go_map_reduce_spark.operators.fakedep2 in docs only."""\n'
        "from go_map_reduce_spark.operators.fakedep import helper\n"
        "def the_query(spark, sf_dir):\n"
        "    # see go_map_reduce_spark.operators.fakedep2 for the twin\n"
        "    return helper()\n"
    )
    _git(fake_repo, "-c", "user.email=t@t", "-c", "user.name=t", "add", "-A")
    _git(
        fake_repo, "-c", "user.email=t@t", "-c", "user.name=t",
        "commit", "-q", "-m", "cite dep2",
    )
    # re-point the artifact at this commit so the evidence is fresh
    (fake_repo / "CORRECTNESS_r01.json").touch()
    _git(fake_repo, "-c", "user.email=t@t", "-c", "user.name=t", "add", "-A")
    _git(
        fake_repo, "-c", "user.email=t@t", "-c", "user.name=t",
        "commit", "-q", "-m", "re-evidence", "--allow-empty",
    )
    _clear_caches()
    assert "fakeq" in gate._evidenced()[0]
    # editing the CITED-only module: no cascade
    dep2.write_text("def other():\n    return 2\n")
    _clear_caches()
    assert "fakeq" in gate._evidenced()[0]
    # editing the IMPORTED module: cascades
    (fake_repo / DEP_REL).write_text("def helper():\n    return 43\n")
    _clear_caches()
    assert "fakeq" in gate._evidenced()[1]


# ---------------------------------------------------------------------------
# Fine-grained (per-function) staleness attribution — r06.
#
# Whole-module comparison made every co-located edit cascade (the r05
# pipeline18 cap edit re-staled its two innocent module-mates). The unit
# closure compares only code a query can reach: its top-level function
# (decorator and oracle string included) plus, transitively, every
# top-level binding that code references, across intra-package imports.
# ---------------------------------------------------------------------------

FINE_MOD_REL = os.path.join("go_map_reduce_spark", "operators", "finemod.py")
FINE_DEP_REL = os.path.join("go_map_reduce_spark", "operators", "finedep.py")
INIT_REL = os.path.join("go_map_reduce_spark", "__init__.py")

FINE_MOD_SRC = (
    "from go_map_reduce_spark.operators.finedep import helper\n"
    "PKG = \"go_map_reduce_spark\"\n"
    "CONST_A = 1\n"
    "CONST_B = 2\n"
    "def deco(oracle):\n"
    "    def d(fn):\n"
    "        return fn\n"
    "    return d\n"
    "def util_a():\n"
    "    return CONST_A\n"
    "@deco(\"SELECT 1\")\n"
    "def query_one(spark, sf_dir):\n"
    "    return util_a() + helper() + len(PKG)\n"
    "def query_two(spark, sf_dir):\n"
    "    from go_map_reduce_spark.operators.finedep import lazy_helper\n"
    "    return CONST_B + lazy_helper()\n"
)
FINE_DEP_SRC = (
    "def helper():\n"
    "    return 42\n"
    "def lazy_helper():\n"
    "    return 7\n"
    "def unrelated():\n"
    "    return 0\n"
)


@pytest.fixture()
def fine_repo(tmp_path, monkeypatch):
    """Throwaway git repo with TWO evidenced queries sharing finemod.py
    (importing finedep.py) so co-located-edit isolation is observable."""
    repo = tmp_path / "repo"
    os.makedirs(repo / "go_map_reduce_spark" / "operators")
    (repo / FINE_MOD_REL).write_text(FINE_MOD_SRC)
    (repo / FINE_DEP_REL).write_text(FINE_DEP_SRC)
    (repo / INIT_REL).write_text(
        "from go_map_reduce_spark.operators import finedep\n"
    )
    (repo / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                name: {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": True,
                    "spark_rows": 1,
                    "oracle_rows": 1,
                    "err": None,
                }
                for name in ("query_one", "query_two")
            }
        )
    )
    _git(repo, "init", "-q")
    _git(repo, "-c", "user.email=t@t", "-c", "user.name=t", "add", "-A")
    _git(
        repo, "-c", "user.email=t@t", "-c", "user.name=t",
        "commit", "-q", "-m", "round 1 artifacts",
    )
    monkeypatch.setattr(gate, "_HERE", str(repo))
    monkeypatch.setattr(
        gate,
        "_module_relpath",
        lambda name: FINE_MOD_REL
        if name in ("query_one", "query_two")
        else None,
    )
    # the fake queries aren't in the real registry — resolve roots by name
    monkeypatch.setattr(
        gate,
        "_query_root",
        lambda name: name if name in ("query_one", "query_two") else None,
    )
    _clear_caches()
    yield repo
    _clear_caches()


def test_colocated_edit_stales_only_the_edited_query(fine_repo):
    """THE r06 contract: editing one query's function re-enters only
    that query — its module-mate keeps its evidence."""
    (fine_repo / FINE_MOD_REL).write_text(
        FINE_MOD_SRC.replace("return CONST_B + lazy_helper()",
                             "return CONST_B + lazy_helper() + 1")
    )
    _clear_caches()
    valid, stale = gate._evidenced()
    assert "query_two" in stale and "query_one" in valid


def test_true_callee_edit_stales_the_caller(fine_repo):
    """util_a is only reachable from query_one — editing it stales
    query_one and leaves query_two valid."""
    (fine_repo / FINE_MOD_REL).write_text(
        FINE_MOD_SRC.replace("return CONST_A", "return CONST_A + 1")
    )
    _clear_caches()
    valid, stale = gate._evidenced()
    assert "query_one" in stale and "query_two" in valid


def test_module_constant_stales_only_its_readers(fine_repo):
    (fine_repo / FINE_MOD_REL).write_text(
        FINE_MOD_SRC.replace("CONST_B = 2", "CONST_B = 3")
    )
    _clear_caches()
    valid, stale = gate._evidenced()
    assert "query_two" in stale and "query_one" in valid


def test_oracle_string_in_decorator_stales_the_query(fine_repo):
    """The oracle SQL lives in the @query decorator — part of the
    function's AST subtree, so changing it must re-enter the query."""
    (fine_repo / FINE_MOD_REL).write_text(
        FINE_MOD_SRC.replace('@deco("SELECT 1")', '@deco("SELECT 2")')
    )
    _clear_caches()
    valid, stale = gate._evidenced()
    assert "query_one" in stale and "query_two" in valid


def test_cross_module_unit_edit_stales_only_reachers(fine_repo):
    """helper() is called by query_one only; lazy_helper() (a
    function-body import) by query_two only; unrelated() by neither."""
    dep = fine_repo / FINE_DEP_REL
    dep.write_text(FINE_DEP_SRC.replace("return 42", "return 43"))
    _clear_caches()
    valid, stale = gate._evidenced()
    assert "query_one" in stale and "query_two" in valid

    dep.write_text(FINE_DEP_SRC.replace("return 7", "return 8"))
    _clear_caches()
    valid, stale = gate._evidenced()
    assert "query_two" in stale and "query_one" in valid

    dep.write_text(FINE_DEP_SRC.replace("return 0", "return 1"))
    _clear_caches()
    valid, stale = gate._evidenced()
    assert "query_one" in valid and "query_two" in valid


def test_init_import_list_growth_does_not_stale(fine_repo):
    """query_one references the bare package name (a string), which
    routes through __init__.py — but an __init__ is an import list that
    grows every round a module is added, and an added import cannot
    change existing behavior. Base-include must keep evidence valid."""
    (fine_repo / INIT_REL).write_text(
        "from go_map_reduce_spark.operators import finedep\n"
        "from go_map_reduce_spark.operators import finemod\n"
    )
    _clear_caches()
    valid, _stale = gate._evidenced()
    assert "query_one" in valid and "query_two" in valid


def test_docstring_edit_keeps_fine_evidence_valid(fine_repo):
    (fine_repo / FINE_MOD_REL).write_text(
        FINE_MOD_SRC.replace(
            "def query_one(spark, sf_dir):\n",
            'def query_one(spark, sf_dir):\n    """Documented now."""\n',
        )
    )
    _clear_caches()
    valid, _stale = gate._evidenced()
    assert "query_one" in valid and "query_two" in valid


def test_package_bans_alias_style_package_imports():
    """The unit tracker resolves `from` imports and string literals; an
    alias-style `import go_map_reduce_spark...` would hide attribute
    access from attribution. The package doesn't use that style — pin
    it so a future module can't silently weaken the tracker."""
    import ast as ast_mod

    pkg_root = os.path.join(os.path.dirname(gate.__file__),
                            "go_map_reduce_spark")
    offenders = []
    for root, _dirs, files in os.walk(pkg_root):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            with open(path) as fh:
                tree = ast_mod.parse(fh.read())
            for node in ast_mod.walk(tree):
                if isinstance(node, ast_mod.Import):
                    for a in node.names:
                        if a.name.split(".")[0] == "go_map_reduce_spark":
                            offenders.append(f"{path}:{node.lineno}")
    assert not offenders, offenders


def test_package_bans_registry_string_key_dispatch():
    """Composing one query from another via QUERIES["name"] creates a
    dependency the unit tracker cannot see (a string subscript is not
    an import edge), so a behavior change in the composed tier would
    leave the composing query's evidence falsely valid — the r06
    review found exactly this in minhash_recall_eval. Queries must
    compose by importing the tier function directly; pin that nothing
    outside registry.py subscripts QUERIES."""
    import ast as ast_mod

    pkg_root = os.path.join(os.path.dirname(gate.__file__),
                            "go_map_reduce_spark")
    offenders = []
    for root, _dirs, files in os.walk(pkg_root):
        for f in files:
            if not f.endswith(".py") or f == "registry.py":
                continue
            path = os.path.join(root, f)
            with open(path) as fh:
                tree = ast_mod.parse(fh.read())
            for node in ast_mod.walk(tree):
                if (
                    isinstance(node, ast_mod.Subscript)
                    and isinstance(node.value, ast_mod.Name)
                    and node.value.id == "QUERIES"
                ):
                    offenders.append(f"{path}:{node.lineno}")
    assert not offenders, offenders
