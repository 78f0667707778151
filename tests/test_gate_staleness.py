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
    gate._artifact_commit.cache_clear()
    gate._blob_at.cache_clear()
    gate._current_source.cache_clear()
    gate._tracked_paths.cache_clear()
    gate._evidenced.cache_clear()


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
    resolves to a registered query."""
    from go_map_reduce_spark.registry import QUERIES

    missing = [n for n in gate._GATE_PRIORITY if n not in QUERIES]
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
