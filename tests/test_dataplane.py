"""Catalog-level versioned source (Nessie dataplane) tests.

Reference behavior: dremio-oss `plugins/dataplane/.../DataplanePlugin.java`
(versioned source), `services/nessie/` (commit model), grammar
`sabot/grammar/.../parserImpls.ftl:943` (branch/tag DDL, AT BRANCH).
"""

from __future__ import annotations

import json
import os

import pytest

from dremio_oss_spark.engine import Engine
from dremio_oss_spark.sources import dataplane as dp
from dremio_oss_spark.sources.iceberg import ConcurrentWriteError

from .conftest import SF_SMALL


@pytest.fixture()
def eng(spark, tmp_path):
    e = Engine(spark)
    e.create_versioned_source("dpsrc", str(tmp_path / "dpsrc"))
    spark.read.parquet(os.path.join(SF_SMALL, "nation.parquet")) \
        .createOrReplaceTempView("nation")
    spark.read.parquet(os.path.join(SF_SMALL, "region.parquet")) \
        .createOrReplaceTempView("region")
    return e


def _n(e, sql):
    return e.sql(sql).first()["n"]


def test_branch_isolation_and_atomic_merge(eng):
    """Two tables written on a branch stay invisible on main until ONE
    merge advances both atomically."""
    eng.sql("CREATE TABLE dpsrc.nat AS select * from nation")
    eng.sql("CREATE TABLE dpsrc.reg AS select * from region")
    eng.sql("CREATE BRANCH dev IN dpsrc")
    eng.sql("INSERT INTO dpsrc.nat AT BRANCH dev VALUES (99, 'X', 0)")
    eng.sql("INSERT INTO dpsrc.reg AT BRANCH dev VALUES (9, 'Y')")
    # isolation: main sees neither write
    assert _n(eng, "select count(*) as n from dpsrc.nat") == 25
    assert _n(eng, "select count(*) as n from dpsrc.reg") == 5
    assert _n(eng, "select count(*) as n from dpsrc.nat AT BRANCH dev") == 26
    assert _n(eng, "select count(*) as n from dpsrc.reg AT BRANCH dev") == 6
    # cross-table join AT BRANCH resolves BOTH refs through the branch
    assert _n(eng, "select count(*) as n from dpsrc.nat AT BRANCH dev t "
                   "join dpsrc.reg AT BRANCH dev r "
                   "on t.n_regionkey = r.r_regionkey") == 26
    eng.sql("MERGE BRANCH dev INTO main IN dpsrc")
    assert _n(eng, "select count(*) as n from dpsrc.nat") == 26
    assert _n(eng, "select count(*) as n from dpsrc.reg") == 6


def test_merge_conflict_rejects_everything(eng):
    """A key changed on both sides since the base rejects the WHOLE
    merge (Nessie VALUE_DIFFERS) — even keys that would merge clean."""
    eng.sql("CREATE TABLE dpsrc.nat AS select * from nation")
    eng.sql("CREATE TABLE dpsrc.reg AS select * from region")
    eng.sql("CREATE BRANCH dev IN dpsrc")
    eng.sql("INSERT INTO dpsrc.nat AT BRANCH dev VALUES (99, 'X', 0)")
    eng.sql("INSERT INTO dpsrc.reg AT BRANCH dev VALUES (9, 'Y')")
    eng.sql("INSERT INTO dpsrc.reg VALUES (8, 'Z')")  # main diverges
    with pytest.raises(ValueError, match="conflict on reg"):
        eng.sql("MERGE BRANCH dev INTO main IN dpsrc")
    # atomicity: the clean key (nat) did NOT advance either
    assert _n(eng, "select count(*) as n from dpsrc.nat") == 25
    assert _n(eng, "select count(*) as n from dpsrc.reg") == 6


def test_remerge_uses_new_base(eng):
    """After a merge, further branch commits merge again — the base is
    the prior merge point (merge_parent edge), so already-merged
    changes never conflict with themselves."""
    eng.sql("CREATE TABLE dpsrc.nat AS select * from nation")
    eng.sql("CREATE BRANCH dev IN dpsrc")
    eng.sql("INSERT INTO dpsrc.nat AT BRANCH dev VALUES (90, 'A', 0)")
    eng.sql("MERGE BRANCH dev INTO main IN dpsrc")
    eng.sql("INSERT INTO dpsrc.nat AT BRANCH dev VALUES (91, 'B', 0)")
    eng.sql("MERGE BRANCH dev INTO main IN dpsrc")
    assert _n(eng, "select count(*) as n from dpsrc.nat") == 27
    # idempotent re-merge: no changes -> noop, head unchanged
    root = eng._versioned_sources["dpsrc"]
    head = dp._load_refs(root)["branches"]["main"]
    res = dp.merge_branch(root, "dev", "main")
    assert res["noop"] and dp._load_refs(root)["branches"]["main"] == head


def test_tag_pins_and_is_immutable(eng):
    eng.sql("CREATE TABLE dpsrc.nat AS select * from nation")
    eng.sql("CREATE TAG v1 IN dpsrc")
    eng.sql("INSERT INTO dpsrc.nat VALUES (99, 'X', 0)")
    assert _n(eng, "select count(*) as n from dpsrc.nat AT TAG v1") == 25
    assert _n(eng, "select count(*) as n from dpsrc.nat") == 26
    # reassign moves the tag; drop removes it
    eng.sql("ALTER TAG v1 ASSIGN BRANCH main IN dpsrc")
    assert _n(eng, "select count(*) as n from dpsrc.nat AT TAG v1") == 26
    eng.sql("DROP TAG v1 IN dpsrc")
    with pytest.raises(ValueError, match="no branch or tag"):
        eng.sql("select count(*) as n from dpsrc.nat AT TAG v1")


def test_versioned_view_expands_at_readers_ref(eng):
    """A view's inner table refs resolve at the READER's ref — AT
    BRANCH dev over a view sees dev's tables (versioned views,
    DataplanePlugin)."""
    eng.sql("CREATE TABLE dpsrc.nat AS select * from nation")
    eng.sql("CREATE VIEW dpsrc.v AS "
            "select count(*) as n from dpsrc.nat")
    eng.sql("CREATE BRANCH dev IN dpsrc")
    eng.sql("INSERT INTO dpsrc.nat AT BRANCH dev VALUES (99, 'X', 0)")
    assert _n(eng, "select n from dpsrc.v") == 25
    assert _n(eng, "select n from dpsrc.v AT BRANCH dev") == 26


def test_branch_dml_cow_detached(eng):
    """DELETE/UPDATE AT BRANCH rewrite against the branch snapshot and
    commit detached — main never observes them; the table's own
    metadata refs never advance (the catalog owns the pointer)."""
    eng.sql("CREATE TABLE dpsrc.nat AS select * from nation")
    eng.sql("CREATE BRANCH dev IN dpsrc")
    eng.sql("DELETE FROM dpsrc.nat AT BRANCH dev WHERE n_nationkey < 5")
    eng.sql("UPDATE dpsrc.nat AT BRANCH dev SET n_name = 'Q' "
            "WHERE n_nationkey = 7")
    assert _n(eng, "select count(*) as n from dpsrc.nat AT BRANCH dev") == 20
    assert _n(eng, "select count(*) as n from dpsrc.nat") == 25
    assert eng.sql("select n_name from dpsrc.nat AT BRANCH dev "
                   "where n_nationkey = 7").first()["n_name"] == "Q"
    assert eng.sql("select n_name from dpsrc.nat "
                   "where n_nationkey = 7").first()["n_name"] != "Q"
    # detached contract: the Iceberg table's own refs map is EMPTY of
    # any branch pointer for dev commits (catalog is authority)
    root = eng._versioned_sources["dpsrc"]
    st = dp.state_at(root, "dev")
    loc = os.path.join(root, st["nat"]["location"])
    hint = os.path.join(loc, "metadata", "version-hint.text")
    with open(hint) as f:
        v = f.read().strip()
    with open(os.path.join(loc, "metadata",
                           f"v{v}.metadata.json")) as f:
        meta = json.load(f)
    assert "dev" not in (meta.get("refs") or {})
    assert meta.get("current-snapshot-id") != st["nat"]["snapshot_id"]


def test_drop_table_on_branch_only(eng):
    eng.sql("CREATE TABLE dpsrc.nat AS select * from nation")
    eng.sql("CREATE BRANCH dev IN dpsrc")
    eng.sql("DROP TABLE dpsrc.nat AT BRANCH dev")
    with pytest.raises(ValueError, match="no table or view"):
        eng.sql("select count(*) as n from dpsrc.nat AT BRANCH dev")
    assert _n(eng, "select count(*) as n from dpsrc.nat") == 25
    eng.sql("MERGE BRANCH dev INTO main IN dpsrc")
    with pytest.raises(ValueError, match="no table or view"):
        eng.sql("select count(*) as n from dpsrc.nat")


def test_use_branch_session_context(eng):
    eng.sql("CREATE TABLE dpsrc.nat AS select * from nation")
    eng.sql("CREATE BRANCH dev IN dpsrc")
    eng.sql("USE BRANCH dev IN dpsrc")
    eng.sql("INSERT INTO dpsrc.nat VALUES (99, 'X', 0)")  # -> dev
    assert _n(eng, "select count(*) as n from dpsrc.nat") == 26
    eng.sql("USE BRANCH main IN dpsrc")
    assert _n(eng, "select count(*) as n from dpsrc.nat") == 25
    # explicit AT wins over session context
    eng.sql("USE BRANCH dev IN dpsrc")
    assert _n(eng,
              "select count(*) as n from dpsrc.nat AT BRANCH main") == 25


def test_show_branches_tags_logs(eng):
    eng.sql("CREATE TABLE dpsrc.nat AS select * from nation")
    eng.sql("CREATE BRANCH dev IN dpsrc")
    eng.sql("CREATE TAG v1 IN dpsrc")
    got = {r["ref_name"] for r in eng.sql("SHOW BRANCHES IN dpsrc").collect()}
    assert got == {"main", "dev"}
    got = {r["ref_name"] for r in eng.sql("SHOW TAGS IN dpsrc").collect()}
    assert got == {"v1"}
    logs = eng.sql("SHOW LOGS IN dpsrc").collect()
    assert [r["message"] for r in logs] == ["create table nat"]
    eng.sql("INSERT INTO dpsrc.nat AT BRANCH dev VALUES (99, 'X', 0)")
    logs = eng.sql("SHOW LOGS AT BRANCH dev IN dpsrc").collect()
    assert [r["message"] for r in logs] == [
        "insert into nat", "create table nat"]


def test_at_commit_reads_history(eng):
    eng.sql("CREATE TABLE dpsrc.nat AS select * from nation")
    root = eng._versioned_sources["dpsrc"]
    c0 = dp._load_refs(root)["branches"]["main"]
    eng.sql("INSERT INTO dpsrc.nat VALUES (99, 'X', 0)")
    assert _n(eng, "select count(*) as n from dpsrc.nat") == 26
    assert _n(eng, f"select count(*) as n from dpsrc.nat "
                   f"AT COMMIT '{c0}'") == 25


def test_cas_guard_raises_on_stale_head(eng, spark):
    eng.sql("CREATE TABLE dpsrc.nat AS select * from nation")
    root = eng._versioned_sources["dpsrc"]
    stale = dp._load_refs(root)["branches"]["main"]
    eng.sql("INSERT INTO dpsrc.nat VALUES (99, 'X', 0)")
    with pytest.raises(ConcurrentWriteError, match="advanced"):
        dp.commit(root, "main", {"x": None}, "stale write",
                  expect_head=stale)


def test_state_checkpoint_bounds_chain_walk(eng, spark):
    """>_CHECKPOINT_EVERY commits embed a full key-list checkpoint;
    state folding stops there instead of replaying to the root."""
    root = eng._versioned_sources["dpsrc"]
    for i in range(dp._CHECKPOINT_EVERY + 3):
        dp.commit(root, "main", {f"k{i}": {"type": "ICEBERG_VIEW",
                                           "sql": f"select {i}"}},
                  f"put k{i}")
    entries = dp.log(root, "main")
    assert any("full_state" in c for c in entries)
    st = dp.state_at(root, "main")
    assert len(st) == dp._CHECKPOINT_EVERY + 3
    # a checkpointed walk reads <= _CHECKPOINT_EVERY commits
    newest_ckpt = next(c for c in entries if "full_state" in c)
    assert entries.index(newest_ckpt) < dp._CHECKPOINT_EVERY


def test_create_on_two_branches_no_collision(eng):
    """The same key CTAS'd independently on two branches gets distinct
    physical locations (content-id model) and a merge conflict."""
    eng.sql("CREATE BRANCH b1 IN dpsrc")
    eng.sql("CREATE BRANCH b2 IN dpsrc")
    eng.sql("CREATE TABLE dpsrc.t AT BRANCH b1 AS select 1 as x")
    eng.sql("CREATE TABLE dpsrc.t AT BRANCH b2 AS select 2 as x")
    root = eng._versioned_sources["dpsrc"]
    l1 = dp.state_at(root, "b1")["t"]["location"]
    l2 = dp.state_at(root, "b2")["t"]["location"]
    assert l1 != l2
    eng.sql("MERGE BRANCH b1 INTO main IN dpsrc")
    with pytest.raises(ValueError, match="conflict on t"):
        eng.sql("MERGE BRANCH b2 INTO main IN dpsrc")
    assert eng.sql("select x from dpsrc.t").first()["x"] == 1


def test_merge_into_on_branch(eng, spark):
    """MERGE INTO <src>.<key> AT BRANCH: COW against the branch
    snapshot (detached), matched rows update, unmatched insert; main
    never observes it."""
    eng.sql("CREATE TABLE dpsrc.nat AS select * from nation")
    eng.sql("CREATE BRANCH dev IN dpsrc")
    spark.sql("select 3 as n_nationkey, 'PATCHED' as n_name, "
              "9 as n_regionkey union all select 99, 'NEW', 0") \
        .createOrReplaceTempView("dp_patch")
    eng.sql("MERGE INTO dpsrc.nat AT BRANCH dev USING dp_patch "
            "ON n_nationkey = n_nationkey "
            "WHEN MATCHED THEN UPDATE SET n_name = 'PATCHED', "
            "n_regionkey = 9 WHEN NOT MATCHED THEN INSERT *")
    assert _n(eng, "select count(*) as n from dpsrc.nat AT BRANCH dev") == 26
    assert eng.sql("select n_name from dpsrc.nat AT BRANCH dev "
                   "where n_nationkey = 3").first()["n_name"] == "PATCHED"
    assert eng.sql("select n_name from dpsrc.nat "
                   "where n_nationkey = 3").first()["n_name"] != "PATCHED"
    assert _n(eng, "select count(*) as n from dpsrc.nat") == 25
    eng.sql("MERGE BRANCH dev INTO main IN dpsrc")
    assert _n(eng, "select count(*) as n from dpsrc.nat") == 26
    spark.catalog.dropTempView("dp_patch")


def test_merge_branch_dry_run(eng):
    """DRY RUN reports mergeable keys / conflicts without committing
    (Nessie's dry-run merge check)."""
    eng.sql("CREATE TABLE dpsrc.nat AS select * from nation")
    eng.sql("CREATE TABLE dpsrc.reg AS select * from region")
    eng.sql("CREATE BRANCH dev IN dpsrc")
    eng.sql("INSERT INTO dpsrc.nat AT BRANCH dev VALUES (99, 'X', 0)")
    eng.sql("INSERT INTO dpsrc.reg AT BRANCH dev VALUES (9, 'Y')")
    eng.sql("INSERT INTO dpsrc.reg VALUES (8, 'Z')")  # main diverges
    row = eng.sql("MERGE BRANCH dev INTO main IN dpsrc DRY RUN").first()
    assert row["mergeable_keys"] == "nat"
    assert row["conflicts"] == "reg"
    assert row["would_succeed"] is False
    # nothing committed by the dry run
    assert _n(eng, "select count(*) as n from dpsrc.nat") == 25


def test_vacuum_source_gc(eng):
    """Catalog GC removes locations reachable only through dropped
    refs; everything reachable (including history) survives."""
    eng.sql("CREATE TABLE dpsrc.nat AS select * from nation")
    eng.sql("CREATE BRANCH tmp IN dpsrc")
    eng.sql("CREATE TABLE dpsrc.scratch AT BRANCH tmp AS select 1 as x")
    root = eng._versioned_sources["dpsrc"]
    assert len(os.listdir(os.path.join(root, "tables"))) == 2
    # still referenced by a live branch: GC removes nothing
    assert dp.gc_unreachable(root) == []
    eng.sql("DROP BRANCH tmp IN dpsrc")
    removed = dp.gc_unreachable(root)
    assert len(removed) == 1 and removed[0].startswith("tables/scratch")
    assert _n(eng, "select count(*) as n from dpsrc.nat") == 25


def test_branch_scoped_schema_evolution(eng, spark):
    """ALTER TABLE AT BRANCH evolves the schema for THAT branch only
    (per-snapshot schema-id): adds null-fill on old rows, branch
    inserts carry the new column, main keeps its schema until merge."""
    eng.sql("CREATE TABLE dpsrc.nat AS select * from nation")
    eng.sql("CREATE BRANCH dev IN dpsrc")
    eng.sql("ALTER TABLE dpsrc.nat AT BRANCH dev "
            "ADD COLUMNS (score double, tag string)")
    assert eng.sql("select * from dpsrc.nat AT BRANCH dev").columns == [
        "n_nationkey", "n_name", "n_regionkey", "score", "tag"]
    assert eng.sql("select * from dpsrc.nat").columns == [
        "n_nationkey", "n_name", "n_regionkey"]
    eng.sql("INSERT INTO dpsrc.nat AT BRANCH dev "
            "VALUES (99, 'X', 0, 1.5, 'new')")
    got = eng.sql("select score, tag from dpsrc.nat AT BRANCH dev "
                  "where n_nationkey = 99").first()
    assert got["score"] == 1.5 and got["tag"] == "new"
    assert _n(eng, "select count(*) as n from dpsrc.nat AT BRANCH dev "
                   "where score is null") == 25
    eng.sql("ALTER TABLE dpsrc.nat AT BRANCH dev DROP COLUMN tag")
    assert "tag" not in eng.sql(
        "select * from dpsrc.nat AT BRANCH dev").columns
    # main still inserts with ITS schema
    eng.sql("INSERT INTO dpsrc.nat VALUES (98, 'Y', 1)")
    # conflict: both branches changed nat
    with pytest.raises(ValueError, match="conflict"):
        eng.sql("MERGE BRANCH dev INTO main IN dpsrc")


def test_versioned_ref_scan_prunes_files(eng):
    """Equality conjuncts on a versioned-source ref prune the FILE set
    through the same manifest-level planner as quoted lake paths — the
    pruned scan reads fewer files than the full table."""
    eng.sql("CREATE TABLE dpsrc.nat PARTITION BY (n_regionkey) "
            "AS select * from nation")
    full = eng.sql("select n_name from dpsrc.nat")
    pruned = eng.sql("select n_name from dpsrc.nat where n_regionkey = 2")
    n_full, n_pruned = len(full.inputFiles()), len(pruned.inputFiles())
    assert n_pruned < n_full, (n_pruned, n_full)
    assert pruned.count() == 5  # rows still correct (5 nations/region)


def test_information_schema_lists_versioned_sources(eng):
    eng.sql("CREATE TABLE dpsrc.nat AS select * from nation")
    eng.sql("CREATE VIEW dpsrc.v AS select 1 as x")
    rows = {(r["table_schema"], r["table_name"], r["table_type"])
            for r in eng.sql(
                "select * from information_schema.tables "
                "where table_schema = 'dpsrc'").collect()}
    assert ("dpsrc", "nat", "TABLE") in rows
    assert ("dpsrc", "v", "VIEW") in rows


def test_information_schema_columns_versioned(eng):
    eng.sql("CREATE TABLE dpsrc.nat AS select * from nation")
    rows = eng.sql(
        "select column_name, data_type from information_schema.columns "
        "where table_name = 'dpsrc.nat' order by ordinal_position"
    ).collect()
    assert [r["column_name"] for r in rows] == [
        "n_nationkey", "n_name", "n_regionkey"]


def test_describe_and_at_timestamp(eng, spark):
    """DESCRIBE on a versioned ref resolves the branch's (possibly
    evolved) schema; AT TIMESTAMP resolves the newest commit at or
    before the instant (Nessie timestamp-resolved refs)."""
    import time as _time

    eng.sql("CREATE TABLE dpsrc.nat AS select * from nation")
    t_after_create = int(_time.time() * 1000)
    cols = [r["column_name"] for r in
            eng.sql("DESCRIBE dpsrc.nat").collect()]
    assert cols == ["n_nationkey", "n_name", "n_regionkey"]
    eng.sql("CREATE BRANCH dev IN dpsrc")
    eng.sql("ALTER TABLE dpsrc.nat AT BRANCH dev ADD COLUMNS (x double)")
    cols_dev = [r["column_name"] for r in
                eng.sql("DESCRIBE dpsrc.nat AT BRANCH dev").collect()]
    assert cols_dev[-1] == "x"
    assert "x" not in [r["column_name"] for r in
                       eng.sql("DESCRIBE dpsrc.nat").collect()]
    _time.sleep(0.05)
    eng.sql("INSERT INTO dpsrc.nat VALUES (99, 'Z', 0)")
    n_then = eng.sql(
        f"select count(*) as n from dpsrc.nat "
        f"AT TIMESTAMP '{t_after_create}'").first()["n"]
    assert n_then == 25
    assert _n(eng, "select count(*) as n from dpsrc.nat") == 26


def test_at_timestamp_honors_use_branch_and_utc(eng):
    """AT TIMESTAMP resolves on the SESSION branch's chain (USE BRANCH
    dev -> dev history, not main's), and a naive ISO timestamp is
    interpreted as UTC regardless of the server's local timezone
    (driver-found r9)."""
    import time as _time
    from datetime import datetime, timezone

    eng.sql("CREATE TABLE dpsrc.nat AS select * from nation")
    eng.sql("CREATE BRANCH dev IN dpsrc")
    _time.sleep(0.05)
    eng.sql("INSERT INTO dpsrc.nat AT BRANCH dev VALUES (99, 'Z', 0)")
    _time.sleep(0.05)
    t_now_ms = int(_time.time() * 1000)
    eng.sql("USE BRANCH dev IN dpsrc")
    try:
        # on dev's chain "now" includes the dev-only insert; resolving
        # against main (the old bug) would return 25
        n = eng.sql(f"select count(*) as n from dpsrc.nat "
                    f"AT TIMESTAMP '{t_now_ms}'").first()["n"]
        assert n == 26
        # naive ISO == the same instant expressed in UTC, not local
        # (+1 s: the ISO form floors to whole seconds)
        iso_utc = datetime.fromtimestamp(
            t_now_ms / 1000 + 1, tz=timezone.utc
        ).strftime("%Y-%m-%dT%H:%M:%S")
        n_iso = eng.sql(f"select count(*) as n from dpsrc.nat "
                        f"AT TIMESTAMP '{iso_utc}'").first()["n"]
        assert n_iso == 26
    finally:
        eng.sql("USE BRANCH main IN dpsrc")


def test_state_walk_bounded_by_checkpoint(eng, monkeypatch):
    """state_at reads O(_CHECKPOINT_EVERY) commit files regardless of
    history length — the key-list checkpoint bound the 100 TB design
    relies on (a million-commit catalog resolves in ~16 reads)."""
    root = eng._versioned_sources["dpsrc"]
    for i in range(3 * dp._CHECKPOINT_EVERY + 5):
        dp.commit(root, "main",
                  {f"k{i}": {"type": "ICEBERG_VIEW", "sql": f"sel {i}"}},
                  f"put {i}")
    reads = {"n": 0}
    orig = dp._read_commit

    def counting(r, c):
        reads["n"] += 1
        return orig(r, c)

    monkeypatch.setattr(dp, "_read_commit", counting)
    st = dp.state_at(root, "main")
    assert len(st) == 3 * dp._CHECKPOINT_EVERY + 5
    assert reads["n"] <= dp._CHECKPOINT_EVERY + 1, reads["n"]


def test_concurrent_commits_serialize_per_branch(eng):
    """Concurrent commits: same-branch writers serialize through the
    lock (both land, heads chain); a writer pinned to a STALE expected
    head gets ConcurrentWriteError; different branches never contend."""
    import threading

    root = eng._versioned_sources["dpsrc"]
    eng.sql("CREATE BRANCH b1 IN dpsrc")
    eng.sql("CREATE BRANCH b2 IN dpsrc")
    errs: list = []

    def put(branch, key):
        try:
            dp.commit(root, branch,
                      {key: {"type": "ICEBERG_VIEW", "sql": "sel 1"}},
                      f"put {key}")
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=put, args=(b, f"t{i}"))
               for i, b in enumerate(["main", "main", "b1", "b2",
                                      "main", "b1"])]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert len(dp.state_at(root, "main")) == 3
    assert len(dp.state_at(root, "b1")) == 2
    assert len(dp.state_at(root, "b2")) == 1
    # log chains are consistent (each commit's parent is its
    # predecessor on the same branch)
    for b, n in (("main", 3), ("b1", 2), ("b2", 1)):
        entries = dp.log(root, b)
        assert len(entries) == n
        for child, parent in zip(entries, entries[1:]):
            assert child["parents"] == [parent["id"]]


def test_cross_process_claim_is_deterministic(eng):
    """Two PROCESSES that planned against the same refs snapshot claim
    the SAME commit file (ids are derived from seq alone, no random
    suffix), so O_EXCL hands the commit to exactly one: the loser gets
    ConcurrentWriteError instead of a silent last-writer-wins on
    refs.json (driver-found r9).  A retry against the advanced head
    lands on the next seq."""
    root = eng._versioned_sources["dpsrc"]
    dp.commit(root, "main", {"t0": {"type": "ICEBERG_VIEW", "sql": "s"}},
              "seed")
    refs = dp._load_refs(root)
    seq, head = refs["seq"], refs["branches"]["main"]
    # simulate the WINNING process: same snapshot, claimed c{seq+1} and
    # advanced refs.json before our in-process commit runs
    win_id = f"c{seq + 1:06d}"
    win_path = os.path.join(dp._commits_dir(root), win_id + ".json")
    with open(win_path, "x") as f:
        json.dump({"id": win_id, "parents": [head], "branch": "main",
                   "ts_ms": 0, "author": "other", "message": "win",
                   "operations": {"t1": {"type": "ICEBERG_VIEW",
                                         "sql": "w"}}}, f)
    with pytest.raises(ConcurrentWriteError):
        dp.commit(root, "main",
                  {"t2": {"type": "ICEBERG_VIEW", "sql": "l"}}, "lose")
    # loser never moved the head or the counter
    refs2 = dp._load_refs(root)
    assert refs2["branches"]["main"] == head and refs2["seq"] == seq
    # winner publishes its refs (what the other process's commit() did)
    refs2["branches"]["main"] = win_id
    refs2["seq"] = seq + 1
    dp._store_refs(root, refs2)
    # retry against the NEW head succeeds on the next seq, chain intact
    cid = dp.commit(root, "main",
                    {"t2": {"type": "ICEBERG_VIEW", "sql": "l"}}, "retry")
    assert cid == f"c{seq + 2:06d}"
    assert set(dp.state_at(root, "main")) == {"t0", "t1", "t2"}


def test_gc_serializes_with_commits(eng):
    """VACUUM SOURCE holds the catalog lock for its WHOLE sweep: a
    commit can never land between the refs read and the commit-file
    sweep and be GC'd as unreachable (driver-found r9).  Stress: one
    thread commits while another runs GC; every branch head must stay
    resolvable afterwards."""
    import threading

    root = eng._versioned_sources["dpsrc"]
    stop = threading.Event()
    errs: list = []

    def committer():
        try:
            for i in range(30):
                dp.commit(root, "main",
                          {f"t{i}": {"type": "ICEBERG_VIEW", "sql": "s"}},
                          f"c{i}")
        except Exception as e:  # noqa: BLE001
            errs.append(e)
        finally:
            stop.set()

    def collector():
        try:
            while not stop.is_set():
                dp.gc_unreachable(root)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=committer),
               threading.Thread(target=collector)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    # every commit survived GC: the full chain still walks
    assert len(dp.state_at(root, "main")) == 30
    assert len(dp.log(root, "main")) == 30


def test_optimize_and_vacuum_on_versioned_table(eng, spark):
    """OPTIMIZE TABLE <src>.<key> AT BRANCH compacts the branch
    snapshot DETACHED (OptimizeHandler.java:129 versioned support):
    rows identical, file count drops, other refs' snapshots untouched;
    VACUUM TABLE expires only snapshots no catalog commit references —
    every branch/tag/AT COMMIT read keeps resolving."""
    import os as _os

    from dremio_oss_spark.sources.iceberg import resolve_snapshot

    root = eng._versioned_sources["dpsrc"]
    eng.sql("CREATE TABLE dpsrc.nat AS select * from nation")
    eng.sql("CREATE BRANCH dev IN dpsrc")
    for i in range(3):
        eng.sql(f"INSERT INTO dpsrc.nat AT BRANCH dev "
                f"VALUES ({100 + i}, 'X{i}', 0)")

    def snap(ref):
        c = dp.state_at(root, ref)["nat"]
        return c["snapshot_id"], len(resolve_snapshot(
            _os.path.join(root, c["location"]), c["snapshot_id"]).files)

    main_before = snap("main")
    _, dev_files = snap("dev")
    assert dev_files >= 4
    out = eng.sql("OPTIMIZE TABLE dpsrc.nat AT BRANCH dev "
                  "(min_input_files = 2)").first()
    assert "files" in out[1]
    dev_sid2, dev_files2 = snap("dev")
    assert dev_files2 < dev_files
    assert snap("main") == main_before, "main must not move"
    assert _n(eng, "select count(*) as n from dpsrc.nat "
                   "AT BRANCH dev") == 28
    assert _n(eng, "select count(*) as n from dpsrc.nat") == 25
    # view refuses
    eng.sql("CREATE VIEW dpsrc.v AS select * from dpsrc.nat")
    with pytest.raises(ValueError, match="view"):
        eng.sql("OPTIMIZE TABLE dpsrc.v")
    # VACUUM: the pre-optimize dev snapshot is still referenced by
    # HISTORY commits (AT COMMIT time travel), so nothing it holds may
    # vanish; a truly unreferenced snapshot's files do
    log_before = dp.log(root, "dev")
    eng.sql("VACUUM TABLE dpsrc.nat EXPIRE SNAPSHOTS")
    # all refs + history still read
    assert _n(eng, "select count(*) as n from dpsrc.nat") == 25
    assert _n(eng, "select count(*) as n from dpsrc.nat "
                   "AT BRANCH dev") == 28
    pre = log_before[1]["id"]   # pre-optimize head (all 3 inserts)
    mid = log_before[2]["id"]   # after 2 of 3 inserts
    assert _n(eng, f"select count(*) as n from dpsrc.nat "
                   f"AT COMMIT '{pre}'") == 28
    assert _n(eng, f"select count(*) as n from dpsrc.nat "
                   f"AT COMMIT '{mid}'") == 27


def test_vacuum_grace_protects_inflight_artifacts(eng):
    """The Nessie-GC cutoff: VACUUM with OLDER_THAN never deletes
    artifacts younger than the window — an in-flight write's detached
    snapshot / table dir is 'unreachable' only because its catalog
    commit has not landed yet (the lock covers commit(), not the long
    Spark write before it)."""
    import os as _os

    from dremio_oss_spark.sources.iceberg import resolve_snapshot

    root = eng._versioned_sources["dpsrc"]
    eng.sql("CREATE TABLE dpsrc.nat AS select * from nation")
    # simulate a mid-flight DML: a detached snapshot exists, catalog
    # commit not yet landed
    c = dp.state_at(root, "main")["nat"]
    loc = _os.path.join(root, c["location"])
    from dremio_oss_spark.sources.iceberg import cow_rewrite_detached
    sid = cow_rewrite_detached(eng.spark, loc, c["snapshot_id"],
                               "delete", "n_nationkey = 0")
    assert sid is not None and sid != c["snapshot_id"]
    # graceful VACUUM spares the young unreferenced snapshot
    eng.sql("VACUUM TABLE dpsrc.nat EXPIRE SNAPSHOTS OLDER_THAN 1 HOUR")
    assert resolve_snapshot(loc, sid) is not None
    # and a branch mid-creation: simulate with an unreachable commit
    # younger than the grace — VACUUM SOURCE with OLDER_THAN keeps it
    eng.sql("CREATE BRANCH tmp IN dpsrc")
    eng.sql("CREATE TABLE dpsrc.tmp_t AT BRANCH tmp AS "
            "select * from region")
    eng.sql("DROP BRANCH tmp IN dpsrc")
    removed = eng.sql("VACUUM SOURCE dpsrc OLDER_THAN 1 HOUR").first()
    assert "removed 0 locations" in removed[1]
    # eager VACUUM (grace 0) reclaims both
    eng.sql("VACUUM TABLE dpsrc.nat EXPIRE SNAPSHOTS")
    with pytest.raises(Exception):
        resolve_snapshot(loc, sid)
    removed = eng.sql("VACUUM SOURCE dpsrc").first()
    assert "removed 1 locations" in removed[1]


def test_seq_fallback_parses_new_format_commit_ids(eng):
    """A refs.json REBUILT without the seq counter (restore/repair)
    must re-derive the sequence from the commit file names, including
    NEW-format deterministic ids `c000001.json` — int("000001.json")
    raised ValueError before the extension strip (advisor-found r10)."""
    root = eng._versioned_sources["dpsrc"]
    dp.commit(root, "main", {"a": {"type": "ICEBERG_VIEW", "sql": "x"}},
              "one")
    dp.commit(root, "main", {"b": {"type": "ICEBERG_VIEW", "sql": "y"}},
              "two")
    refs = dp._load_refs(root)
    last = refs["seq"]
    refs.pop("seq")            # simulate a pre-counter / rebuilt store
    dp._store_refs(root, refs)
    cid = dp.commit(root, "main",
                    {"c": {"type": "ICEBERG_VIEW", "sql": "z"}}, "three")
    assert cid == f"c{last + 1:06d}"
    assert dp._load_refs(root)["seq"] == last + 1


def test_nessie_proxy_routes(eng):
    """Nessie REST v2 proxy (NessieSourceResource.java:41 +
    ProxyV2TreeResource.java): a vanilla Nessie client walks
    trees/entries/history/contents over the seeded dataplane source
    and the output matches SHOW BRANCHES / SHOW LOGS."""
    import json as _json
    import urllib.request as rq

    from dremio_oss_spark.server.rest import serve_rest_background

    eng.sql("CREATE TABLE dpsrc.base AS select * from nation")
    eng.sql("CREATE BRANCH dev IN dpsrc")
    eng.sql("CREATE TABLE dpsrc.folder.extra AT BRANCH dev "
            "AS select * from region")
    eng.sql("CREATE VIEW dpsrc.v_nat AT BRANCH dev "
            "AS select n_name from dpsrc.base")
    eng.sql("CREATE TAG rel1 IN dpsrc")  # tag at main's head
    server, _t = serve_rest_background(eng)
    port = server.server_address[1]

    def get(path):
        req = rq.Request(f"http://127.0.0.1:{port}{path}")
        try:
            with rq.urlopen(req) as r:
                return r.status, _json.loads(r.read())
        except rq.HTTPError as e:
            return e.code, _json.loads(e.read())

    try:
        # trees matches SHOW BRANCHES / SHOW TAGS
        code, out = get("/nessie-proxy/v2/source/dpsrc/trees")
        assert code == 200, out
        got = {(r["type"], r["name"]): r["hash"]
               for r in out["references"]}
        branches = {r["ref_name"]: r["commit_id"] for r in
                    eng.sql("SHOW BRANCHES IN dpsrc").collect()}
        tags = {r["ref_name"]: r["commit_id"] for r in
                eng.sql("SHOW TAGS IN dpsrc").collect()}
        assert got == {**{("BRANCH", n): c for n, c in
                          branches.items()},
                       **{("TAG", n): c for n, c in tags.items()}}
        # single reference; @hash form resolves
        code, ref = get("/nessie-proxy/v2/source/dpsrc/trees/dev")
        assert code == 200 and ref["reference"]["type"] == "BRANCH"
        dev_head = ref["reference"]["hash"]
        code, ref2 = get(
            f"/nessie-proxy/v2/source/dpsrc/trees/dev@{dev_head}")
        assert code == 200 and ref2["reference"]["hash"] == dev_head
        # entries: dev sees base + folder.extra + v_nat; main only base
        code, ents = get(
            "/nessie-proxy/v2/source/dpsrc/trees/dev/entries")
        assert code == 200
        names = {tuple(e["name"]["elements"]): e["type"]
                 for e in ents["entries"]}
        assert names == {("base",): "ICEBERG_TABLE",
                         ("folder", "extra"): "ICEBERG_TABLE",
                         ("v_nat",): "ICEBERG_VIEW"}
        assert ents["effectiveReference"]["name"] == "dev"
        code, ents_main = get(
            "/nessie-proxy/v2/source/dpsrc/trees/main/entries")
        assert {tuple(e["name"]["elements"])
                for e in ents_main["entries"]} == {("base",)}
        # history matches SHOW LOGS (same ids, same order)
        code, hist = get(
            "/nessie-proxy/v2/source/dpsrc/trees/dev/history")
        assert code == 200
        want = [r["commit_id"] for r in
                eng.sql("SHOW LOGS AT BRANCH dev IN dpsrc").collect()]
        assert [e["commitMeta"]["hash"]
                for e in hist["logEntries"]] == want
        assert all(e["commitMeta"]["commitTime"].endswith("+00:00")
                   for e in hist["logEntries"])
        # contents: table carries snapshot + metadata location; view
        # carries its SQL; both key spellings work
        code, c = get("/nessie-proxy/v2/source/dpsrc/trees/dev/"
                      "contents/folder.extra")
        assert code == 200 and c["content"]["type"] == "ICEBERG_TABLE"
        assert c["content"]["snapshotId"] is not None
        code, c2 = get("/nessie-proxy/v2/source/dpsrc/trees/dev/"
                       "contents/folder/extra")
        assert code == 200 and c2["content"] == c["content"]
        code, cv = get("/nessie-proxy/v2/source/dpsrc/trees/dev/"
                       "contents/v_nat")
        assert cv["content"]["type"] == "ICEBERG_VIEW"
        assert "n_name" in cv["content"]["sqlText"]
        # a tag resolves entries at ITS pinned commit
        code, enttag = get(
            "/nessie-proxy/v2/source/dpsrc/trees/rel1/entries")
        assert code == 200
        assert enttag["effectiveReference"]["type"] == "TAG"
        assert {tuple(e["name"]["elements"])
                for e in enttag["entries"]} == {("base",)}
        # errors: unknown source / ref / key; writes refused
        assert get("/nessie-proxy/v2/source/nope/trees")[0] == 404
        assert get("/nessie-proxy/v2/source/dpsrc/trees/nope")[0] \
            == 404
        assert get("/nessie-proxy/v2/source/dpsrc/trees/dev/"
                   "contents/nope")[0] == 404
        req = rq.Request(
            f"http://127.0.0.1:{port}"
            "/nessie-proxy/v2/source/dpsrc/trees/x",
            data=b"{}", method="POST",
            headers={"Content-Type": "application/json"})
        try:
            rq.urlopen(req)
            raise AssertionError("POST should be refused")
        except rq.HTTPError as e:
            assert e.code == 405
    finally:
        server.shutdown()


def test_nessie_proxy_write_routes(eng):
    """VERDICT r13 top item: the proxy is read-WRITE like the
    reference's (ProxyV2TreeResource.java:112 createReference, :226
    assignReference, :245 deleteReference, :363
    commitMultipleOperations).  A stock-Nessie-client-shaped flow —
    create branch, commit an ICEBERG_TABLE Put, read it back via
    entries/contents AND via SELECT ... AT BRANCH — works over the
    same dataplane CAS the SQL DDL uses, and a stale expected-hash
    commit 409s without half-writing."""
    import json as _json
    import urllib.request as rq

    from dremio_oss_spark.server.rest import serve_rest_background

    eng.sql("CREATE TABLE dpsrc.base AS select * from nation")
    server, _t = serve_rest_background(eng)
    port = server.server_address[1]

    def call(method, path, body=None):
        req = rq.Request(
            f"http://127.0.0.1:{port}{path}",
            data=(_json.dumps(body).encode()
                  if body is not None else None),
            method=method,
            headers={"Content-Type": "application/json"})
        try:
            with rq.urlopen(req) as r:
                return r.status, _json.loads(r.read())
        except rq.HTTPError as e:
            return e.code, _json.loads(e.read())

    base = "/nessie-proxy/v2/source/dpsrc"
    try:
        _, ref = call("GET", f"{base}/trees/main")
        main_head = ref["reference"]["hash"]
        # createReference: branch "feature" from main's head
        code, out = call("POST", f"{base}/trees?name=feature"
                         "&type=BRANCH",
                         body={"name": "main", "hash": main_head})
        assert code == 200, out
        assert out["reference"] == {"type": "BRANCH",
                                    "name": "feature",
                                    "hash": main_head}
        # duplicate name → Nessie conflict, not a 500
        code, out = call("POST", f"{base}/trees?name=feature"
                         "&type=BRANCH", body={"name": "main"})
        assert code == 409, out
        # commit a Put: re-register base's content at a new key,
        # replaying the content object read from /contents verbatim
        _, c = call("GET", f"{base}/trees/main/contents/base")
        content = c["content"]
        code, out = call(
            "POST", f"{base}/trees/feature@{main_head}/history/commit",
            body={"commitMeta": {"message": "register copy"},
                  "operations": [
                      {"type": "PUT",
                       "key": {"elements": ["folder", "copy"]},
                       "content": content}]})
        assert code == 200, out
        new_head = out["targetBranch"]["hash"]
        assert new_head != main_head
        assert out["addedContents"][0]["key"]["elements"] == \
            ["folder", "copy"]
        # read back via entries + contents
        _, ents = call("GET", f"{base}/trees/feature/entries")
        assert ("folder", "copy") in {
            tuple(e["name"]["elements"]) for e in ents["entries"]}
        _, c2 = call("GET",
                     f"{base}/trees/feature/contents/folder.copy")
        assert c2["content"]["metadataLocation"] == \
            content["metadataLocation"]
        assert c2["content"]["snapshotId"] == content["snapshotId"]
        # ...and via SQL AT BRANCH: same rows as the source table
        n = eng.sql("select count(*) as n from dpsrc.folder.copy "
                    "AT BRANCH feature").first()["n"]
        assert n == eng.sql("select count(*) as n from dpsrc.base"
                            ).first()["n"]
        # the proxied commit is a first-class log entry
        logs = eng.sql("SHOW LOGS AT BRANCH feature IN dpsrc"
                       ).collect()
        assert logs[0]["commit_id"] == new_head
        assert logs[0]["message"] == "register copy"
        # STALE expected-hash commit → 409, and NOTHING half-written
        code, out = call(
            "POST", f"{base}/trees/feature@{main_head}/history/commit",
            body={"commitMeta": {"message": "stale"},
                  "operations": [
                      {"type": "DELETE",
                       "key": {"elements": ["folder", "copy"]}}]})
        assert code == 409, out
        assert out.get("errorCode") == "REFERENCE_CONFLICT"
        _, ref = call("GET", f"{base}/trees/feature")
        assert ref["reference"]["hash"] == new_head  # head unmoved
        assert len(eng.sql("SHOW LOGS AT BRANCH feature IN dpsrc")
                   .collect()) == len(logs)          # no half-write
        # a view Put (wrapped legacy op shape) is queryable AT BRANCH
        code, out = call(
            "POST", f"{base}/trees/feature@{new_head}/history/commit",
            body={"commitMeta": {"message": "view"},
                  "operations": [
                      {"Put": {"key": {"elements": ["v1"]},
                               "content": {
                                   "type": "ICEBERG_VIEW",
                                   "sqlText": "select n_name from "
                                              "dpsrc.base"}}}]})
        assert code == 200, out
        v_head = out["targetBranch"]["hash"]
        rows = eng.sql("select * from dpsrc.v1 AT BRANCH feature"
                       ).collect()
        assert len(rows) == 25 and rows[0].__fields__ == ["n_name"]
        # assignReference with a stale guard → 409; fresh → repoint
        code, out = call("PUT", f"{base}/trees/feature@{main_head}",
                         body={"name": "main", "hash": main_head})
        assert code == 409, out
        code, out = call("PUT", f"{base}/trees/feature@{v_head}",
                         body={"name": "main", "hash": main_head})
        assert code == 200, out
        assert out["reference"]["hash"] == main_head
        # merge: re-point feature forward again, then proxy-merge a
        # branch carrying a table into main
        code, out = call("PUT", f"{base}/trees/feature@{main_head}",
                         body={"hash": v_head})
        assert code == 200, out
        _, ref = call("GET", f"{base}/trees/main")
        code, out = call(
            "POST",
            f"{base}/trees/main@{ref['reference']['hash']}"
            "/history/merge",
            body={"fromRefName": "feature"})
        assert code == 200 and out["wasApplied"], out
        assert eng.sql("select count(*) as n from dpsrc.folder.copy"
                       ).first()["n"] == 25
        # deleteReference: stale hash 409s, current hash deletes
        code, out = call("DELETE", f"{base}/trees/feature@{main_head}")
        assert code == 409, out
        _, ref = call("GET", f"{base}/trees/feature")
        code, out = call(
            "DELETE", f"{base}/trees/feature@{ref['reference']['hash']}")
        assert code == 200, out
        assert call("GET", f"{base}/trees/feature")[0] == 404
        # unknown mutation verbs still answer 405, never half-route
        assert call("POST", f"{base}/trees/main/diff")[0] == 405
    finally:
        server.shutdown()


def test_nessie_proxy_diff_route(eng):
    """GET /trees/{from}/diff/{to} (getDiff, ProxyV2TreeResource.java:
    195): per-key from/to content pairs; branch-only keys appear with
    a null side, @hash pins resolve, identical keys are omitted."""
    import json as _json
    import urllib.request as rq

    from dremio_oss_spark.server.rest import serve_rest_background

    eng.sql("CREATE TABLE dpsrc.base AS select * from nation")
    eng.sql("CREATE BRANCH dev IN dpsrc")
    eng.sql("CREATE TABLE dpsrc.extra AT BRANCH dev "
            "AS select * from region")
    eng.sql("INSERT INTO dpsrc.base AT BRANCH dev "
            "VALUES (99, 'X', 0)")
    server, _t = serve_rest_background(eng)
    port = server.server_address[1]

    def get(path):
        try:
            with rq.urlopen(
                    f"http://127.0.0.1:{port}{path}") as r:
                return r.status, _json.loads(r.read())
        except rq.HTTPError as e:
            return e.code, _json.loads(e.read())

    base = "/nessie-proxy/v2/source/dpsrc"
    try:
        code, out = get(f"{base}/trees/main/diff/dev")
        assert code == 200, out
        by_key = {tuple(d["key"]["elements"]):
                  (d["from"], d["to"]) for d in out["diffs"]}
        # extra exists only on dev; base diverged (insert on dev)
        assert set(by_key) == {("extra",), ("base",)}
        assert by_key[("extra",)][0] is None
        assert by_key[("extra",)][1]["type"] == "ICEBERG_TABLE"
        assert by_key[("base",)][0]["snapshotId"] != \
            by_key[("base",)][1]["snapshotId"]
        assert out["effectiveFromReference"]["name"] == "main"
        assert out["effectiveToReference"]["name"] == "dev"
        # identical refs → empty diff; pinned @hash resolves
        code, out = get(f"{base}/trees/main/diff/main")
        assert code == 200 and out["diffs"] == []
        dev_head = get(f"{base}/trees/dev")[1]["reference"]["hash"]
        code, out = get(f"{base}/trees/main/diff/dev@{dev_head}")
        assert code == 200 and len(out["diffs"]) == 2
        assert get(f"{base}/trees/main/diff/nope")[0] == 404
    finally:
        server.shutdown()
