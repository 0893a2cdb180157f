"""Copy-on-write DML over parquet tables: DELETE / UPDATE / MERGE.

Reference: dremio-oss executes DML as Iceberg copy-on-write or
merge-on-read plans (`exec/planner/physical/DmlCopyOnWritePlanGenerator.java`,
`DmlPositionalMergeOnReadPlanGenerator.java`; parser surface
`sabot/grammar/src/main/codegen/data/Parser.tdd:624-685`).

Spark-first: each statement is a declarative DataFrame plan that produces
the table's next snapshot, written to a new snapshot directory and
atomically swapped via a `_current` pointer file — the same
snapshot-pointer design Iceberg uses, minus the manifest layer (no
Iceberg runtime jars in this environment).  All heavy work (the anti
join for DELETE, the expression rewrite for UPDATE, the full outer join
for MERGE) is distributed; the driver only flips the pointer.

At 100 TB: copy-on-write rewrites only the partitions whose rows match
(pass partition_by so output stays partitioned and Catalyst can prune
the untouched partitions on read; the matched-partition optimization is
the reference's `DmlUtils` pruning).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import Column, DataFrame, SparkSession

POINTER = "_current"


def _snapshot_dir(table: str) -> str:
    return os.path.join(table, f"snap-{uuid.uuid4().hex[:12]}")


def _pointer_file(table: str, branch: str = "main") -> str:
    return os.path.join(table, POINTER if branch == "main" else f"{POINTER}.{branch}")


def current_snapshot(table: str, branch: str = "main") -> str | None:
    p = _pointer_file(table, branch)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return os.path.join(table, f.read().strip())


def _log_file(table: str, branch: str) -> str:
    return os.path.join(table, f"_log.{branch}")


def _branch_log(table: str, branch: str) -> list[str]:
    """Commit ancestry of a branch, oldest-first (snapshot basenames)."""
    p = _log_file(table, branch)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return [ln.strip() for ln in f if ln.strip()]


def _commit(table: str, snap: str, branch: str = "main") -> None:
    p = _pointer_file(table, branch)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        f.write(os.path.basename(snap))
    os.replace(tmp, p)  # atomic pointer flip
    with open(_log_file(table, branch), "a") as f:
        f.write(os.path.basename(snap) + "\n")  # ancestry for MERGE BRANCH


# -- branches (Nessie-style: a branch is a named pointer; reference
#    CREATE/DROP/ASSIGN/MERGE BRANCH, `AT BRANCH` syntax parserImpls.ftl:943)
def create_branch(table: str, branch: str, from_branch: str = "main") -> None:
    src = current_snapshot(table, from_branch)
    if src is None:
        raise FileNotFoundError(f"no snapshot on branch {from_branch!r}")
    # seed the new branch's ancestry with the parent's so a later merge
    # back can recognize fast-forwards
    parent_log = _branch_log(table, from_branch)
    with open(_log_file(table, branch), "w") as f:
        f.write("".join(s + "\n" for s in parent_log[:-1]))
    _commit(table, src, branch)


def drop_branch(table: str, branch: str) -> None:
    if branch == "main":
        raise ValueError("cannot drop main")
    p = _pointer_file(table, branch)
    if os.path.exists(p):
        os.remove(p)
    lg = _log_file(table, branch)
    if os.path.exists(lg):
        os.remove(lg)


def list_branches(table: str) -> list[str]:
    out = ["main"] if os.path.exists(_pointer_file(table)) else []
    prefix = POINTER + "."
    out += sorted(
        f[len(prefix):]
        for f in os.listdir(table)
        if f.startswith(prefix) and not f.endswith(".tmp")
    )
    return out


def assign_branch(table: str, branch: str, to_branch: str) -> None:
    """ASSIGN BRANCH: fast-forward `to_branch` to `branch`'s snapshot
    (merge for this snapshot model — branches share the snapshot pool)."""
    src = current_snapshot(table, branch)
    if src is None:
        raise FileNotFoundError(f"no snapshot on branch {branch!r}")
    _commit(table, src, to_branch)


def merge_branch(table: str, from_branch: str, into_branch: str = "main") -> str:
    """MERGE BRANCH <from> INTO <into> (parserImpls.ftl:943).

    Fast-forward only, like Nessie's default when the target has not
    diverged: if `into`'s head is an ancestor of `from` (per the branch
    commit logs), flip `into` to `from`'s head.  A diverged target —
    commits on `into` unknown to `from` — raises, matching the
    reference's merge-conflict error rather than guessing a content
    merge.  Returns 'up-to-date' or 'fast-forward'."""
    src = current_snapshot(table, from_branch)
    dst = current_snapshot(table, into_branch)
    if src is None:
        raise FileNotFoundError(f"no snapshot on branch {from_branch!r}")
    if dst is not None and os.path.basename(src) == os.path.basename(dst):
        return "up-to-date"
    from_log = _branch_log(table, from_branch)
    if dst is not None and os.path.basename(dst) not in from_log:
        raise ValueError(
            f"MERGE BRANCH {from_branch} INTO {into_branch}: branches have "
            "diverged (non-fast-forward); rebase or assign explicitly"
        )
    _commit(table, src, into_branch)
    return "fast-forward"


# -- tags (immutable named snapshots; reference CREATE/DROP/ASSIGN TAG,
#    `AT TAG` syntax parserImpls.ftl:943)
def _tag_file(table: str, tag: str) -> str:
    return os.path.join(table, f"_tag.{tag}")


def create_tag(table: str, tag: str, branch: str = "main") -> None:
    """CREATE TAG <tag> [AT BRANCH <branch>] — immutable: re-creating an
    existing tag errors (use drop_tag first), unlike a branch pointer."""
    if os.path.exists(_tag_file(table, tag)):
        raise FileExistsError(f"tag {tag!r} already exists")
    src = current_snapshot(table, branch)
    if src is None:
        raise FileNotFoundError(f"no snapshot on branch {branch!r}")
    tmp = _tag_file(table, tag) + ".tmp"
    with open(tmp, "w") as f:
        f.write(os.path.basename(src))
    os.replace(tmp, _tag_file(table, tag))


def drop_tag(table: str, tag: str) -> None:
    p = _tag_file(table, tag)
    if os.path.exists(p):
        os.remove(p)


def list_tags(table: str) -> list[str]:
    prefix = "_tag."
    return sorted(
        f[len(prefix):]
        for f in os.listdir(table)
        if f.startswith(prefix) and not f.endswith(".tmp")
    )


def read_at_tag(spark: SparkSession, table: str, tag: str) -> DataFrame:
    """SELECT ... AT TAG <tag>."""
    p = _tag_file(table, tag)
    if not os.path.exists(p):
        raise FileNotFoundError(f"no tag {tag!r}")
    with open(p) as f:
        return read_at(spark, table, f.read().strip())


def create_table(df: DataFrame, table: str, partition_by: list[str] | None = None) -> None:
    os.makedirs(table, exist_ok=True)
    snap = _snapshot_dir(table)
    w = df.write
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(snap)
    _commit(table, snap)


def read(spark: SparkSession, table: str, branch: str = "main") -> DataFrame:
    """Read the table AT BRANCH <branch> (default main)."""
    snap = current_snapshot(table, branch)
    if snap is None:
        raise FileNotFoundError(f"no committed snapshot in {table} [{branch}]")
    return spark.read.parquet(snap)


def history(table: str) -> list[str]:
    """Snapshot ids oldest-first (Iceberg table-history equivalent;
    reference surfaces this as `SHOW LOGS` / time-travel metadata)."""
    snaps = [d for d in os.listdir(table) if d.startswith("snap-")]
    return sorted(snaps, key=lambda d: os.path.getmtime(os.path.join(table, d)))


def read_at(spark: SparkSession, table: str, snapshot: str) -> DataFrame:
    """Time travel: AT SNAPSHOT '<id>' (reference TimeTravelTableMacro,
    `exec/tablefunctions/TimeTravelTableMacro.java`)."""
    return spark.read.parquet(os.path.join(table, snapshot))


def truncate(spark: SparkSession, table: str, branch: str = "main") -> None:
    """TRUNCATE TABLE (Parser.tdd): commit an empty snapshot with the
    current schema — prior snapshots stay time-travelable until vacuum."""
    cur = read(spark, table, branch)
    snap = _snapshot_dir(table)
    spark.createDataFrame([], cur.schema).write.parquet(snap)
    _commit(table, snap, branch)


def rollback(table: str, snapshot: str) -> None:
    """ROLLBACK TABLE ... TO SNAPSHOT (Parser.tdd ROLLBACK TABLE): flip
    the pointer back; newer snapshots stay until vacuumed."""
    if not os.path.isdir(os.path.join(table, snapshot)):
        raise FileNotFoundError(snapshot)
    _commit(table, os.path.join(table, snapshot))


def _fork_snapshot(table: str, parent: str) -> str:
    """New snapshot sharing the parent's data files via symlinks (zero
    data copy, like Iceberg manifests referencing unchanged files).
    Prior delete files are carried forward the same way; realpath keeps
    link chains one hop deep."""
    snap = _snapshot_dir(table)
    os.makedirs(snap)
    for fn in os.listdir(parent):
        if fn == "_deletes":
            continue
        os.symlink(os.path.realpath(os.path.join(parent, fn)),
                   os.path.join(snap, fn))
    pdel = os.path.join(parent, "_deletes")
    if os.path.isdir(pdel):
        ddir = os.path.join(snap, "_deletes")
        os.makedirs(ddir)
        for fn in os.listdir(pdel):
            # never symlink job-commit markers/checksums: the append write
            # into this fork re-commits _SUCCESS/.crc, and a symlinked one
            # would write through into the (immutable) parent snapshot
            if fn == "_SUCCESS" or fn.endswith(".crc"):
                continue
            os.symlink(os.path.realpath(os.path.join(pdel, fn)),
                       os.path.join(ddir, fn))
    return snap


def delete_where_mor(spark: SparkSession, table: str, cond: Column,
                     key_cols: list[str], branch: str = "main") -> None:
    """Merge-on-read DELETE (reference
    DmlPositionalMergeOnReadPlanGenerator): instead of rewriting data
    files, append the matching keys to a delete-file sidecar; reads
    anti-join it out.  Write cost ~|deleted keys| instead of |table| —
    the right trade for small deletes on huge tables; OPTIMIZE folds the
    deletes back into data files.

    Commits a NEW snapshot (data via symlinks, deletes accumulated) so
    the parent snapshot stays immutable: other branches pointing at it,
    and time-travel reads of it, do not see this branch's delete.
    """
    cur = read_mor(spark, table, key_cols, branch)  # respect prior deletes
    parent = current_snapshot(table, branch)
    if parent is None:
        raise FileNotFoundError(f"no committed snapshot in {table} [{branch}]")
    deletes = cur.where(cond).select(*key_cols)
    snap = _fork_snapshot(table, parent)
    # "_deletes" starts with an underscore, so plain parquet scans of the
    # snapshot dir ignore it (Hadoop hidden-file convention) — only
    # read_mor applies it
    deletes.write.mode("append").parquet(os.path.join(snap, "_deletes"))
    _commit(table, snap, branch)


def read_mor(spark: SparkSession, table: str, key_cols: list[str],
             branch: str = "main") -> DataFrame:
    """Read with merge-on-read delete files applied (anti-join on keys).
    No broadcast hint: the accumulated delete-key set is unbounded on a
    long-lived branch, so AQE costs the join — broadcasting only while
    the set genuinely fits (the same fix as the lake formats' MOR
    paths)."""
    snap = current_snapshot(table, branch)
    if snap is None:
        raise FileNotFoundError(f"no committed snapshot in {table} [{branch}]")
    data = spark.read.parquet(snap)
    del_path = os.path.join(snap, "_deletes")
    if os.path.exists(del_path):
        dels = spark.read.parquet(del_path).distinct()
        data = data.join(dels, key_cols, "left_anti")
    return data


def optimize(spark: SparkSession, table: str, key_cols: list[str],
             branch: str = "main", target_partitions: int | None = None) -> None:
    """OPTIMIZE TABLE (Parser.tdd OPTIMIZE): compact merge-on-read delete
    files into a fresh copy-on-write snapshot and coalesce small files."""
    merged = read_mor(spark, table, key_cols, branch)
    if target_partitions:
        merged = merged.coalesce(target_partitions)
    snap = _snapshot_dir(table)
    merged.write.parquet(snap)
    _commit(table, snap, branch)


def vacuum(table: str, keep: int = 1) -> list[str]:
    """VACUUM: drop all but the newest `keep` snapshots.  Never removes
    (a) any branch's current snapshot, (b) any tag's pinned snapshot, or
    (c) a snapshot whose data files are symlink-referenced by a surviving
    MOR snapshot.  Returns removed snapshot ids."""
    import shutil

    protected = {
        os.path.basename(cur)
        for b in list_branches(table)
        if (cur := current_snapshot(table, b)) is not None
    }
    for t in list_tags(table):  # tags pin their snapshot forever
        with open(_tag_file(table, t)) as f:
            protected.add(f.read().strip())
    snaps = history(table)
    removable = [s for s in (snaps[:-keep] if keep else snaps) if s not in protected]

    # MOR snapshots symlink to parent data files: keep any snapshot a
    # surviving snapshot still points into (transitively — a protected
    # parent's own links protect the grandparent)
    # resolve the table base too: if any component of `table` is itself a
    # symlink, relpath(realpath(p), table) would yield '../…' and link
    # targets would silently lose protection
    table_real = os.path.realpath(table)

    def _link_targets(snap: str) -> set[str]:
        out: set[str] = set()
        for root, dirs, files in os.walk(os.path.join(table, snap)):
            for fn in dirs + files:
                p = os.path.join(root, fn)
                if os.path.islink(p):
                    rel = os.path.relpath(os.path.realpath(p), table_real)
                    if rel.startswith(".."):
                        continue  # link escapes the table dir: not a snapshot ref
                    top = rel.split(os.sep)[0]
                    if top.startswith("snap-"):
                        out.add(top)
        return out

    kept = [s for s in snaps if s not in removable]
    seen: set[str] = set()
    while kept:
        s = kept.pop()
        if s in seen:
            continue
        seen.add(s)
        for t in _link_targets(s):
            if s != t and t not in seen:
                kept.append(t)
    removable = [s for s in removable if s not in seen]

    for s in removable:
        shutil.rmtree(os.path.join(table, s), ignore_errors=True)
    return removable


def delete_where(spark: SparkSession, table: str, cond: Column,
                 branch: str = "main") -> None:
    """DELETE FROM table [AT BRANCH ...] WHERE cond (copy-on-write)."""
    cur = read(spark, table, branch)
    snap = _snapshot_dir(table)
    cur.where(~cond | cond.isNull()).write.parquet(snap)
    _commit(table, snap, branch)


def update_where(
    spark: SparkSession, table: str, cond: Column, assignments: dict[str, Column],
    branch: str = "main",
) -> None:
    """UPDATE table SET col=expr WHERE cond (copy-on-write)."""
    from pyspark.sql import functions as F

    cur = read(spark, table, branch)
    out = cur
    for col, expr in assignments.items():
        out = out.withColumn(col, F.when(cond, expr).otherwise(F.col(col)))
    snap = _snapshot_dir(table)
    out.write.parquet(snap)
    _commit(table, snap, branch)


def merge_into(
    spark: SparkSession,
    table: str,
    source: DataFrame,
    on: list[str],
    update_cols: list[str] | None = None,
    insert_when_not_matched: bool = True,
) -> None:
    """MERGE INTO table USING source ON keys
    WHEN MATCHED THEN UPDATE SET <update_cols from source>
    WHEN NOT MATCHED THEN INSERT * (source must carry the target schema).

    One left join (updates) + one anti join (inserts), both shuffling on
    the merge keys — the classic distributed upsert (the reference's
    DmlPositionalMergeOnReadPlanGenerator does the positional
    equivalent).
    """
    from pyspark.sql import functions as F

    cur = read(spark, table)
    upd = source.select(
        *on,
        *[F.col(c).alias(f"_src_{c}") for c in (update_cols or [])],
    ).withColumn("_m", F.lit(True))

    out = cur.join(upd, on, "left")
    for c in update_cols or []:
        out = out.withColumn(
            c, F.when(F.col("_m"), F.col(f"_src_{c}")).otherwise(F.col(c))
        )
    out = out.select(*cur.columns)

    if insert_when_not_matched:
        inserts = source.join(cur.select(*on), on, "left_anti").select(*cur.columns)
        out = out.unionByName(inserts)

    snap = _snapshot_dir(table)
    out.write.parquet(snap)
    _commit(table, snap)
