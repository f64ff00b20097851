"""The constant oracles behind g40/g42/g44/g79/g80 must never drift
from the INDEPENDENT pure-Python derivation: re-derive every constant
from the raw reference corpus (tests/oracle_sim ingest semantics +
union-find / BFS / Kahn in tools/corpus_golden_calc.py) and compare to
graphdb_neo4j_spark/corpus_golden.py.  Spark-vs-constant is covered by
tests/test_oracle_parity.py, so together the two tests check the
engine against a second implementation, not against itself."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from graphdb_neo4j_spark import corpus_golden as CG

calc = pytest.importorskip("tools.corpus_golden_calc")


@pytest.fixture(scope="module")
def computed():
    return calc.compute_all()


def test_g40_component_sizes(computed):
    assert [tuple(r) for r in CG.G40_COMPONENT_SIZES] == computed["g40"]


def test_g42_bfs_depths(computed):
    assert [tuple(r) for r in CG.G42_BFS_DEPTHS] == computed["g42"]


def test_g44_golden_counts(computed):
    assert [tuple(r) for r in CG.G44_GOLDEN_COUNTS] == computed["g44"]


def test_g79_topo_levels(computed):
    assert [tuple(r) for r in CG.G79_TOPO_LEVELS] == computed["g79"]


def test_g80_undirected_degree(computed):
    assert [tuple(r) for r in CG.G80_UNDIRECTED_DEGREE] == computed["g80"]


def test_g43_injector_files(computed):
    assert [tuple(r) for r in CG.G43_INJECTOR_FILES] == computed["g43"]


def test_g46_scc_shape(computed):
    assert [tuple(r) for r in CG.G46_SCC_SHAPE] == computed["g46"]
    # independent-Tarjan sanity: the spawn graph is a forest/DAG
    (n_comp, n_vert, max_size), = computed["g46"]
    assert n_comp == n_vert and max_size == 1


def test_g48_kcore_sizes(computed):
    assert [tuple(r) for r in CG.G48_KCORE_SIZES] == computed["g48"]


def test_g55_optional_spawn_files(computed):
    assert [tuple(r) for r in CG.G55_OPTIONAL_SPAWN_FILES] == computed["g55"]


def test_g72_greedy_matching(computed):
    got = [tuple(r) for r in CG.G72_GREEDY_MATCHING]
    assert got == computed["g72"]
    # matching property on the independent derivation: no shared vertex
    pairs = got[1:]
    seen = [v for p in pairs for v in p]
    assert len(seen) == len(set(seen))


def test_g75_independent_set(computed):
    assert [tuple(r) for r in CG.G75_INDEPENDENT_SET] == computed["g75"]


def test_g58_varlen_paths(computed):
    assert [tuple(r) for r in CG.G58_VARLEN_PATHS] == computed["g58"]


def test_g76_greedy_coloring(computed):
    got = [tuple(r) for r in CG.G76_GREEDY_COLORING]
    assert got == computed["g76"]
    # internal cross-check of the md5-order greedy family: the color-0
    # class IS the greedy MIS in the same order
    assert got[0][1] == int(CG.G75_INDEPENDENT_SET[0][1])
