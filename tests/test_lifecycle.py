"""Lifecycle behavioral matrix — ports of the reference's unit specs:
`AliasSwitchSpec.scala:28-93`, `IndexDeletionSpec.scala:13-86`,
`IndexableStreamSpec.scala:16-52`, `IndexLogicSpec.scala:18-62`.

Pure-Python (no Spark): the catalog is metadata, exactly as in the reference.
"""

import json
import random

import pytest

from elastic_indexer4s_spark.plans.alias import (
    AliasSwitchError, check_threshold, switch_alias,
)
from elastic_indexer4s_spark.plans.catalog import GenerationCatalog
from elastic_indexer4s_spark.plans.retention import delete_oldest
from elastic_indexer4s_spark.results import (
    IndexError, RunResult, StageSucceeded, run_stages,
)


def mk_catalog(tmp_path, gens):
    """gens: list of (name, creation_time, doc_count, aliases)."""
    cat = GenerationCatalog(str(tmp_path / "indices"))
    for name, ts, count, aliases in gens:
        cat.register(name, creation_time=ts)
        with open(f"{cat.path(name)}/stats.json", "w") as f:
            json.dump({"num_docs": count, "avg_dl": 10.0}, f)
        for a in aliases:
            cat.add_alias(a, name)
    return cat


# --- alias switching (AliasSwitchSpec.scala:28-93) --------------------------

def test_create_alias_when_missing(tmp_path):
    cat = mk_catalog(tmp_path, [("idx_new", 2, 10, [])])
    res = switch_alias(cat, "live", "idx_new")
    assert "Added alias" in res.msg
    assert cat.indices_by_age_for("live") == ["idx_new"]


def test_switch_within_threshold(tmp_path):
    cat = mk_catalog(tmp_path, [
        ("idx_old", 1, 10, ["live"]),
        ("idx_new", 2, 10, []),
    ])
    res = switch_alias(cat, "live", "idx_new")
    assert "Switched alias" in res.msg
    assert cat.indices_by_age_for("live") == ["idx_new"]


@pytest.mark.parametrize("old,new", [(10, 5), (10, 30), (10, 9)])
def test_reject_outside_threshold(tmp_path, old, new):
    cat = mk_catalog(tmp_path, [
        ("idx_old", 1, old, ["live"]),
        ("idx_new", 2, new, []),
    ])
    with pytest.raises(AliasSwitchError):
        switch_alias(cat, "live", "idx_new")
    assert cat.indices_by_age_for("live") == ["idx_old"]


def test_switch_removes_from_oldest_compares_with_latest(tmp_path):
    # reference: remove alias from OLDEST carrier, compare size with LATEST
    cat = mk_catalog(tmp_path, [
        ("idx_a", 1, 999, ["live"]),   # oldest carrier — alias removed here
        ("idx_b", 2, 10, ["live"]),    # latest carrier — size compared here
        ("idx_new", 3, 10, []),
    ])
    res = switch_alias(cat, "live", "idx_new")
    assert "from idx_a" in res.msg
    assert cat.indices_by_age_for("live") == ["idx_b", "idx_new"]


def test_threshold_boundaries():
    # minT < ratio <= maxT  (AliasSwitching.scala:54)
    assert not check_threshold(0.95, 1.25, 0.95)
    assert check_threshold(0.95, 1.25, 0.951)
    assert check_threshold(0.95, 1.25, 1.25)
    assert not check_threshold(0.95, 1.25, 1.2500001)


# --- retention GC (IndexDeletionSpec.scala:13-86) ----------------------------

def gens10(prefix="index"):
    g = [(f"{prefix}{i}", i, 10, []) for i in range(1, 11)]
    random.Random(0).shuffle(g)  # reference shuffles input (spec :60)
    return g


def test_never_delete_new_index(tmp_path):
    cat = mk_catalog(tmp_path, gens10())
    delete_oldest(cat, "index", new_index="index1", keep=0)
    assert [i.index for i in cat.all_indices_with_info()] == ["index1"]


def test_keep_k_newest(tmp_path):
    cat = mk_catalog(tmp_path, gens10())
    delete_oldest(cat, "index", new_index="index10", keep=2)
    left = [i.index for i in cat.all_indices_with_info()]
    assert left == ["index8", "index9", "index10"]


def test_alias_protection(tmp_path):
    gens = [("index1", 1, 10, ["live"]), ("index2", 2, 10, []),
            ("index3", 3, 10, [])]
    cat = mk_catalog(tmp_path, gens)
    delete_oldest(cat, "index", new_index="index3", keep=0, protect_alias=True)
    left = [i.index for i in cat.all_indices_with_info()]
    assert left == ["index1", "index3"]
    # without protection the aliased one goes too
    cat2 = mk_catalog(tmp_path / "b", gens)
    delete_oldest(cat2, "index", new_index="index3", keep=0, protect_alias=False)
    assert [i.index for i in cat2.all_indices_with_info()] == ["index3"]


def test_prefix_scoping(tmp_path):
    gens = [("aaa1", 1, 10, []), ("bbb1", 2, 10, []), ("aaa2", 3, 10, [])]
    cat = mk_catalog(tmp_path, gens)
    delete_oldest(cat, "aaa", new_index="aaa2", keep=0)
    left = [i.index for i in cat.all_indices_with_info()]
    assert left == ["bbb1", "aaa2"]


def test_deletes_oldest_first(tmp_path):
    cat = mk_catalog(tmp_path, gens10())
    delete_oldest(cat, "index", new_index="index10", keep=7)
    left = [i.index for i in cat.all_indices_with_info()]
    assert left == [f"index{i}" for i in range(3, 11)]


# --- stage railway (IndexLogicSpec / IndexableStreamSpec) --------------------

def test_run_order_and_success_log():
    log = []

    def mk(name):
        def stage():
            log.append(name)
            return StageSucceeded(f"{name} ok")
        return stage

    res = run_stages([("index", mk("index")), ("switch", mk("switch")),
                      ("delete", mk("delete"))])
    assert isinstance(res, RunResult)
    assert log == ["index", "switch", "delete"]
    msgs = [s.msg for s in res.succeeded_stages]
    assert [m.split(" [")[0] for m in msgs] == [
        "index ok", "switch ok", "delete ok"]


def test_failure_preserves_succeeded_stages():
    def boom():
        raise ValueError("kaput")

    res = run_stages([
        ("index", lambda: StageSucceeded("Indexed 987 documents successfully")),
        ("switch", boom),
        ("delete", lambda: StageSucceeded("never runs")),
    ])
    assert isinstance(res, IndexError)
    assert [s.msg.split(" [")[0] for s in res.succeeded_stages] == [
        "Indexed 987 documents successfully"]
    assert "kaput" in str(res)


def test_catalog_scan_join(tmp_path):
    # A9: list indices with alias info joined by name, age-ascending
    cat = mk_catalog(tmp_path, [
        ("idx_b", 2, 5, ["hot"]), ("idx_a", 1, 3, ["hot", "cold"]),
        ("idx_c", 3, 7, []),
    ])
    infos = cat.all_indices_with_info()
    assert [i.index for i in infos] == ["idx_a", "idx_b", "idx_c"]
    assert infos[0].aliases == ("cold", "hot")
    assert infos[2].aliases == ()
    # A10/A11
    assert cat.indices_by_age_for("hot") == ["idx_a", "idx_b"]
    assert cat.latest_index_with_alias_size("hot") == 5
    assert cat.latest_index_with_alias_size("nope") is None
