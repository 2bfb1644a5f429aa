"""Snapshot layer (plans/snapshots.py): isolation, time travel, schema
evolution, rollback, expiration, orphan cleanup, non-destructive rewrite,
and the run_pipeline / compact_outputs integration."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from fastobo_py_spark.plans import snapshots as S


def _write_batch(spark, out, rows, schema="idspace string, x int"):
    spark.createDataFrame(rows, schema).write.mode("append").partitionBy("idspace").parquet(
        f"{out}/nodes"
    )


def _commit_delta(out, pre, **kw):
    post = S.list_data_files(out)
    return S.commit_snapshot(
        out, added={t: sorted(post[t] - pre[t]) for t in S.TABLES}, **kw
    ), post


def test_snapshot_isolation_and_time_travel(spark):
    out = tempfile.mkdtemp(prefix="snap_")
    try:
        pre = S.list_data_files(out)
        _write_batch(spark, out, [("A", 1), ("B", 2)])
        s1, post1 = _commit_delta(out, pre)
        _write_batch(spark, out, [("A", 3)])
        s2, post2 = _commit_delta(out, post1)

        # HEAD sees both batches; snapshot 1 sees only the first
        assert S.current_snapshot_id(out) == s2["snapshot_id"]
        head = S.read_table_at(spark, out, "nodes")
        assert head.count() == 3
        old = S.read_table_at(spark, out, "nodes", snapshot_id=s1["snapshot_id"])
        assert sorted(r["x"] for r in old.collect()) == [1, 2]
        # partition column survives explicit-file reads (basePath)
        assert {r["idspace"] for r in old.collect()} == {"A", "B"}

        # uncommitted files are INVISIBLE to snapshot readers (isolation)
        _write_batch(spark, out, [("C", 9)])
        assert S.read_table_at(spark, out, "nodes").count() == 3

        # AS OF timestamp resolves along the HEAD chain
        assert S.snapshot_as_of(out, s1["created_at_ms"]) == s1["snapshot_id"]
        assert S.snapshot_as_of(out, s2["created_at_ms"] + 10) == s2["snapshot_id"]
        with pytest.raises(ValueError):
            S.snapshot_as_of(out, s1["created_at_ms"] - 10)

        # the uncommitted batch is an orphan; remove_orphan_files reaps it,
        # along with crashed rewrite/delete staging dirs
        os.makedirs(os.path.join(out, "_delete_tmp-dead", "nodes"))
        assert S.remove_orphan_files(out) >= 1
        assert not os.path.exists(os.path.join(out, "_delete_tmp-dead"))
        assert S.read_table_at(spark, out, "nodes").count() == 3
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_schema_evolution_across_snapshots(spark):
    """A column added by a later batch: old snapshots read the old
    schema; HEAD merges (added column NULL for old rows)."""
    out = tempfile.mkdtemp(prefix="snap_ev_")
    try:
        pre = S.list_data_files(out)
        _write_batch(spark, out, [("A", 1)])
        s1, post1 = _commit_delta(out, pre)
        spark.createDataFrame(
            [("B", 2, "new")], "idspace string, x int, extra string"
        ).write.mode("append").partitionBy("idspace").parquet(f"{out}/nodes")
        s2, _ = _commit_delta(out, post1)

        old = S.read_table_at(spark, out, "nodes", snapshot_id=s1["snapshot_id"])
        assert "extra" not in old.columns
        head = S.read_table_at(spark, out, "nodes")
        assert "extra" in head.columns
        vals = {r["x"]: r["extra"] for r in head.collect()}
        assert vals == {1: None, 2: "new"}
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_rollback_and_divergent_history(spark):
    out = tempfile.mkdtemp(prefix="snap_rb_")
    try:
        pre = S.list_data_files(out)
        _write_batch(spark, out, [("A", 1)])
        s1, post1 = _commit_delta(out, pre)
        _write_batch(spark, out, [("A", 2)])
        s2, post2 = _commit_delta(out, post1)

        S.rollback(out, s1["snapshot_id"])
        assert S.read_table_at(spark, out, "nodes").count() == 1
        # next commit parents from the restored HEAD; s2 becomes a branch
        _write_batch(spark, out, [("A", 5)])
        s3, _ = _commit_delta(out, post2)  # delta = only the batch just written
        assert s3["parent_id"] == s1["snapshot_id"]
        assert sorted(
            r["x"] for r in S.read_table_at(spark, out, "nodes").collect()
        ) == [1, 5]
        # s2 is still addressable by id until expiration
        assert S.read_table_at(spark, out, "nodes", snapshot_id=s2["snapshot_id"]).count() == 2
        with pytest.raises(ValueError):
            S.rollback(out, "nonexistent000")
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_expire_snapshots_rebases_and_deletes(spark):
    out = tempfile.mkdtemp(prefix="snap_exp_")
    try:
        pre = S.list_data_files(out)
        _write_batch(spark, out, [("A", 1)])
        s1, post1 = _commit_delta(out, pre)
        _write_batch(spark, out, [("A", 2)])
        s2, post2 = _commit_delta(out, post1)
        _write_batch(spark, out, [("A", 3)])
        s3, _ = _commit_delta(out, post2)

        st = S.expire_snapshots(out, keep_last=2)
        assert st["expired"] == 1  # s1's JSON gone
        # nothing deleted: appends never removed files, all still referenced
        assert st["deleted_files"] == 0
        # s2 was rebased to a root and still resolves the full history
        assert sorted(
            r["x"] for r in S.read_table_at(spark, out, "nodes", snapshot_id=s2["snapshot_id"]).collect()
        ) == [1, 2]
        assert S.read_table_at(spark, out, "nodes").count() == 3
        with pytest.raises(ValueError):
            S.resolve_files(out, "nodes", s1["snapshot_id"])
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_rewrite_data_files_preserves_time_travel(spark):
    """Iceberg-style non-destructive compaction: readers flip atomically,
    pre-rewrite snapshots keep reading, expiration reclaims the originals."""
    out = tempfile.mkdtemp(prefix="snap_rw_")
    try:
        pre = S.list_data_files(out)
        for i in range(4):  # 4 fragmented appends into one partition
            _write_batch(spark, out, [("A", i)])
        s1, _ = _commit_delta(out, pre)
        n_before = len(S.resolve_files(out, "nodes"))
        assert n_before >= 4

        st = S.rewrite_data_files(spark, out, max_parts=1, target_bytes=1 << 30)
        assert st["leaves_rewritten"] >= 1
        head_files = S.resolve_files(out, "nodes")
        assert len(head_files) < n_before
        assert sorted(r["x"] for r in S.read_table_at(spark, out, "nodes").collect()) == [0, 1, 2, 3]
        # the PRE-rewrite snapshot still reads correctly (originals retained)
        assert sorted(
            r["x"] for r in S.read_table_at(spark, out, "nodes", snapshot_id=s1["snapshot_id"]).collect()
        ) == [0, 1, 2, 3]
        # expiration reclaims the replaced originals
        st2 = S.expire_snapshots(out, keep_last=1)
        assert st2["deleted_files"] >= 4
        assert sorted(r["x"] for r in S.read_table_at(spark, out, "nodes").collect()) == [0, 1, 2, 3]
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_rewrite_preserves_evolved_schema(spark):
    """Compaction must not lose schema-evolved columns (code-review r5):
    a leaf mixing pre- and post-evolution files, rewritten, still serves
    the added column at HEAD — even after the originals are expired."""
    out = tempfile.mkdtemp(prefix="snap_rwev_")
    try:
        pre = S.list_data_files(out)
        _write_batch(spark, out, [("A", 1)])
        spark.createDataFrame(
            [("A", 2, "kept")], "idspace string, x int, extra string"
        ).write.mode("append").partitionBy("idspace").parquet(f"{out}/nodes")
        _commit_delta(out, pre)

        S.rewrite_data_files(spark, out, max_parts=1, target_bytes=1 << 30)
        S.expire_snapshots(out, keep_last=1)
        head = {r["x"]: r.asDict().get("extra") for r in S.read_table_at(spark, out, "nodes").collect()}
        assert head == {1: None, 2: "kept"}
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_pipeline_commits_snapshots(spark, corpus):
    """run_pipeline: every batch commits a snapshot; resume batches with
    nothing pending still commit (empty delta); time travel between two
    ingest batches sees the first batch's row counts."""
    from fastobo_py_spark.plans.pipeline import run_pipeline

    out = tempfile.mkdtemp(prefix="snap_pipe_")
    try:
        half = corpus.where(F.crc32(F.col("path")) % 2 == 0)
        m1 = run_pipeline(spark, half, out, canonicalize=False)
        m2 = run_pipeline(spark, corpus, out, canonicalize=False)
        assert m1["snapshot_id"] != m2["snapshot_id"]
        snaps = S.list_snapshots(out)
        assert [s["snapshot_id"] for s in snaps[-2:]] == [m1["snapshot_id"], m2["snapshot_id"]]

        n1 = S.read_table_at(spark, out, "nodes", snapshot_id=m1["snapshot_id"]).count()
        nh = S.read_table_at(spark, out, "nodes").count()
        assert 0 < n1 < nh
        # snapshot reads match the plain-path reads (no dup/missing files)
        assert nh == spark.read.parquet(f"{out}/nodes").count()
        eh = S.read_table_at(spark, out, "edges").count()
        assert eh == spark.read.parquet(f"{out}/edges").count()
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_compact_outputs_syncs_snapshot_log(spark, corpus):
    """Destructive compaction on a snapshotted dir: finishes with HEAD
    matching the physical state and history expired — snapshot readers
    never see missing files."""
    from fastobo_py_spark.plans.pipeline import compact_outputs, run_pipeline

    out = tempfile.mkdtemp(prefix="snap_comp_")
    try:
        run_pipeline(spark, corpus, out, canonicalize=False)
        n0 = S.read_table_at(spark, out, "nodes").count()
        st = compact_outputs(spark, out, max_parts=0, target_bytes=1 << 30)
        assert st["leaves_compacted"] > 0
        assert "snapshots_expired" in st
        assert S.read_table_at(spark, out, "nodes").count() == n0
        # every referenced file physically exists
        for t in S.TABLES:
            for rel in S.resolve_files(out, t):
                assert os.path.exists(os.path.join(out, rel)), rel
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_build_kg_cli_delete_and_tag(spark):
    """CLI integration for the round-5 maintenance flags: --delete-where
    commits an op=delete snapshot and --tag pins the result; the pinned
    tag reads the post-delete state."""
    import json as _json
    import os as _os
    import subprocess
    import sys

    out = tempfile.mkdtemp(prefix="kg_cli_dt_")
    try:
        # subprocess, not in-process main(): the CLI stops its session on
        # exit, which would kill the shared pytest SparkContext
        proc = subprocess.run(
            [
                sys.executable,
                _os.path.join(_os.path.dirname(__file__), "..", "jobs", "build_kg.py"),
                "--synthetic", "8", "--out", out, "--no-canonicalize",
                "--delete-where", "substring(doc_sha, 1, 1) < '8'",
                "--tag", "prod",
                "--master", "local[4]",
            ],
            capture_output=True,
            text=True,
            timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        metrics = _json.loads(proc.stdout.strip().splitlines()[-1])
        assert metrics["delete_where"]["deleted_rows"] > 0
        assert metrics["tagged_snapshot"] == S.current_snapshot_id(out)
        tagged = S.read_table_at(spark, out, "edges", tag="prod")
        assert tagged.where("substring(doc_sha, 1, 1) < '8'").count() == 0
        assert tagged.count() > 0
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_build_kg_cli_merge_into(spark):
    """CLI integration for --merge-into: a corrections parquet (one
    doc's edges rewritten to a single marker edge) upserts by doc_sha
    through the CLI and the result reads back from HEAD."""
    import json as _json
    import os as _os
    import subprocess
    import sys

    out = tempfile.mkdtemp(prefix="kg_cli_mrg_")
    src_dir = tempfile.mkdtemp(prefix="kg_cli_mrg_src_")
    try:
        cli = [_os.path.join(_os.path.dirname(__file__), "..", "jobs", "build_kg.py")]
        proc = subprocess.run(
            [sys.executable, *cli, "--synthetic", "8", "--out", out,
             "--no-canonicalize", "--master", "local[4]"],
            capture_output=True, text=True, timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        edges = S.read_table_at(spark, out, "edges")
        sha = edges.select("doc_sha").orderBy("doc_sha").first()["doc_sha"]
        spark.createDataFrame(
            [("FIX:0000001", "is_a", "FIX:0000000", "is_a", sha, "FIX", 0)],
            "subj string, pred string, obj string, src_tag string, "
            "doc_sha string, idspace string, salt int",
        ).write.parquet(_os.path.join(src_dir, "corrections"))

        proc = subprocess.run(
            [sys.executable, *cli, "--synthetic", "8", "--out", out,
             "--no-canonicalize", "--master", "local[4]",
             "--merge-into", "edges", _os.path.join(src_dir, "corrections"),
             "--merge-on", "doc_sha"],
            capture_output=True, text=True, timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        metrics = _json.loads(proc.stdout.strip().splitlines()[-1])
        assert metrics["merge_into"]["matched_rows"] > 0
        head = S.read_table_at(spark, out, "edges")
        got = head.where(head.doc_sha == sha).collect()
        assert [(r["subj"], r["pred"], r["obj"]) for r in got] == [
            ("FIX:0000001", "is_a", "FIX:0000000")
        ]
        assert head.count() > 1  # other docs untouched
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(src_dir, ignore_errors=True)


def test_build_kg_cli_wap_publish(spark):
    """CLI write-audit-publish: one invocation stages the batch on a
    branch and fast-forwards main after maintenance; a second all-resumed
    invocation (empty delta, committed to the BRANCH per the documented
    composition) publishes cleanly instead of diverging main."""
    import json as _json
    import os as _os
    import subprocess
    import sys

    out = tempfile.mkdtemp(prefix="kg_cli_wap_")
    cli = [_os.path.join(_os.path.dirname(__file__), "..", "jobs", "build_kg.py")]
    try:
        base = [sys.executable, *cli, "--synthetic", "8", "--out", out,
                "--no-canonicalize", "--master", "local[4]",
                "--branch", "audit", "--publish-branch", "audit"]
        # maintenance composes with WAP: publish runs FIRST, the rewrite
        # then applies to the published main (it used to run before the
        # fast-forward and make it fail as divergent)
        proc = subprocess.run(
            base + ["--rewrite-data-files", "--rewrite-sort-by", "doc_sha"],
            capture_output=True, text=True, timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        metrics = _json.loads(proc.stdout.strip().splitlines()[-1])
        assert metrics["snapshot_id"] == metrics["published_snapshot"]
        assert metrics["rewrite_data_files"]["leaves_rewritten"] >= 1
        assert S.read_table_at(spark, out, "edges").count() > 0

        # each run cuts a FRESH branch (the WAP convention): the first
        # run's ref is stale once maintenance advanced main past it
        base2 = [a.replace("audit", "audit2") for a in base]
        proc2 = subprocess.run(base2, capture_output=True, text=True, timeout=300)
        assert proc2.returncode == 0, proc2.stderr[-2000:]
        m2 = _json.loads(proc2.stdout.strip().splitlines()[-1])
        assert m2["docs_in_batch"] == 0  # all resumed
        assert m2["published_snapshot"] == S.current_snapshot_id(out)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_build_kg_cli_flag_validation():
    """CLI guard rails: --synthetic 0 and the destructive/non-destructive
    compaction pair are usage errors (exit 2), before any Spark startup."""
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "build_kg_cli", _os.path.join(_os.path.dirname(__file__), "..", "jobs", "build_kg.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    with pytest.raises(SystemExit) as e:
        mod.main(["--synthetic", "0", "--out", "/tmp/x"])
    assert e.value.code == 2
    with pytest.raises(SystemExit) as e:
        mod.main(["--synthetic", "5", "--out", "/tmp/x", "--compact-outputs", "--rewrite-data-files"])
    assert e.value.code == 2
    # a typo'd merge table or empty key list must die BEFORE the batch
    # runs (otherwise the whole run's metrics JSON is lost on exit)
    with pytest.raises(SystemExit) as e:
        mod.main(["--synthetic", "5", "--out", "/tmp/x", "--merge-into", "edge", "/tmp/src"])
    assert e.value.code == 2
    with pytest.raises(SystemExit) as e:
        mod.main(["--synthetic", "5", "--out", "/tmp/x",
                  "--merge-into", "edges", "/tmp/src", "--merge-on", ","])
    assert e.value.code == 2
    with pytest.raises(SystemExit) as e:
        mod.main(["--synthetic", "5", "--out", "/tmp/x", "--rewrite-sort-by", "doc_sha"])
    assert e.value.code == 2
    with pytest.raises(SystemExit) as e:
        mod.main(["--synthetic", "5", "--out", "/tmp/x",
                  "--eq-delete-where", "substring(doc_sha,1,1) < '8'",
                  "--expire-snapshots", "1"])
    assert e.value.code == 2
    with pytest.raises(SystemExit) as e:
        mod.main(["--synthetic", "5", "--out", "/tmp/x", "--branch", "audit", "--tag", "prod"])
    assert e.value.code == 2


def test_heal_does_not_resurrect_rolled_back_data(spark, corpus):
    """After rollback, the abandoned batch's files are on disk but
    unreferenced; the next run_pipeline entry heal must NOT re-adopt them
    (code-review r5): HEAD keeps only batch 1 + the new batch."""
    from fastobo_py_spark.plans.pipeline import run_pipeline

    out = tempfile.mkdtemp(prefix="snap_norez_")
    try:
        third = corpus.where(F.crc32(F.col("path")) % 3 == 0)
        two_thirds = corpus.where(F.crc32(F.col("path")) % 3 <= 1)
        m1 = run_pipeline(spark, third, out, canonicalize=False)
        n1 = S.read_table_at(spark, out, "nodes").count()
        run_pipeline(spark, two_thirds, out, canonicalize=False)
        assert S.read_table_at(spark, out, "nodes").count() > n1

        S.rollback(out, m1["snapshot_id"])
        # batch 3 ingests fresh docs; batch 2's rows were ROLLED BACK and
        # must not reappear even though their files are still on disk
        m3 = run_pipeline(spark, corpus.where(F.crc32(F.col("path")) % 3 == 2), out, canonicalize=False)
        assert m3["snapshot_id"] != m1["snapshot_id"]
        head_nodes = S.read_table_at(spark, out, "nodes")
        n_head = head_nodes.count()
        assert n_head < spark.read.parquet(f"{out}/nodes").count()  # disk holds more (orphans)
        # batch-2 docs are exactly the missing ones
        b1 = S.read_table_at(spark, out, "nodes", snapshot_id=m1["snapshot_id"]).count()
        b3 = n_head - b1
        assert b3 == m3["nodes"]
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_heal_adopts_destructive_compaction_crash(spark):
    """The one crash shape the heal MUST adopt: a leaf whose referenced
    files were renamed away by a destructive compaction swap. Intact
    leaves with extra (orphan) files are left alone in the same pass."""
    from fastobo_py_spark.plans.snapshots import heal_snapshot

    out = tempfile.mkdtemp(prefix="snap_healleaf_")
    try:
        pre = S.list_data_files(out)
        _write_batch(spark, out, [("A", 1), ("B", 2)])
        s1, post1 = _commit_delta(out, pre)
        n0 = S.read_table_at(spark, out, "nodes").count()

        # simulate compact_outputs crash on leaf A: rewrite its parts
        # under new names, delete the originals, NO snapshot commit
        leaf = os.path.join(out, "nodes", "idspace=A")
        olds = [f for f in os.listdir(leaf) if f.endswith(".parquet")]
        spark.read.parquet(leaf).coalesce(1).write.mode("overwrite").parquet(f"{out}/_tmpleaf")
        import shutil as _sh

        for f in olds:
            os.remove(os.path.join(leaf, f))
        for f in os.listdir(f"{out}/_tmpleaf"):
            if f.endswith(".parquet"):
                os.rename(f"{out}/_tmpleaf/{f}", os.path.join(leaf, f"compacted-{f}"))
        _sh.rmtree(f"{out}/_tmpleaf")
        # and an ingest orphan in the INTACT leaf B — must stay invisible
        _write_batch(spark, out, [("B", 99)])

        snap, _listing = heal_snapshot(out)
        assert snap is not None and snap["op"] == "heal"
        got = sorted(r["x"] for r in S.read_table_at(spark, out, "nodes").collect())
        assert got == [1, 2]  # leaf A healed, orphan 99 not adopted
        assert S.read_table_at(spark, out, "nodes").count() == n0
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_expire_with_table_subset_preserves_other_tables(spark):
    """expire_snapshots(tables=('nodes',)) must not erase edges history
    from the rebased boundary snapshot (code-review r5)."""
    out = tempfile.mkdtemp(prefix="snap_subset_")
    try:
        pre = S.list_data_files(out)
        _write_batch(spark, out, [("A", 1)])
        spark.createDataFrame([("A", 7)], "idspace string, y int").write.mode("append").partitionBy(
            "idspace"
        ).parquet(f"{out}/edges")
        s1, post1 = _commit_delta(out, pre)
        _write_batch(spark, out, [("A", 2)])
        s2, _ = _commit_delta(out, post1)

        S.expire_snapshots(out, keep_last=1, tables=("nodes",))
        assert S.read_table_at(spark, out, "edges").count() == 1  # still referenced
        assert S.read_table_at(spark, out, "nodes").count() == 2
        # and a follow-up orphan sweep must not delete live edges files
        assert S.remove_orphan_files(out) == 0
        assert S.read_table_at(spark, out, "edges").count() == 1
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_incremental_read_between_snapshots(spark):
    """read_incremental = Iceberg's incremental append scan: exactly the
    rows appended after `from` (exclusive) up to `to`/HEAD; replace
    snapshots (rewrite_data_files) contribute nothing; from==to is empty;
    divergent or expired `from` raises."""
    out = tempfile.mkdtemp(prefix="snap_incr_")
    try:
        pre = S.list_data_files(out)
        _write_batch(spark, out, [("A", 1), ("B", 2)])
        s1, post1 = _commit_delta(out, pre)
        _write_batch(spark, out, [("A", 3)])
        s2, post2 = _commit_delta(out, post1)
        _write_batch(spark, out, [("B", 4)])
        s3, post3 = _commit_delta(out, post2)

        inc = S.read_incremental(spark, out, "nodes", s1["snapshot_id"])
        assert sorted(r["x"] for r in inc.collect()) == [3, 4]
        # partition column survives (basePath scan shape)
        assert {r["idspace"] for r in inc.collect()} == {"A", "B"}
        # bounded range: (s1, s2] is just batch 2
        mid = S.read_incremental(spark, out, "nodes", s1["snapshot_id"], s2["snapshot_id"])
        assert [r["x"] for r in mid.collect()] == [3]
        # empty range
        assert (
            S.read_incremental(spark, out, "nodes", s3["snapshot_id"]).count() == 0
        )

        # a non-destructive compaction (op=replace) must NOT re-deliver rows
        S.rewrite_data_files(spark, out, max_parts=0, target_bytes=1 << 30)
        inc2 = S.read_incremental(spark, out, "nodes", s1["snapshot_id"])
        assert sorted(r["x"] for r in inc2.collect()) == [3, 4]

        with pytest.raises(ValueError):
            S.incremental_files(out, "nodes", "nonexistent000")
        # divergent history: roll back to s1, commit a branch; s2 is no
        # longer an ancestor of HEAD
        S.rollback(out, s1["snapshot_id"])
        S.commit_snapshot(out, added={t: [] for t in S.TABLES})  # HEAD branches off s1
        with pytest.raises(ValueError, match="not an ancestor"):
            S.incremental_files(out, "nodes", s2["snapshot_id"])
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_delete_where_copy_on_write(spark):
    """delete_where = Iceberg CoW DELETE: matching rows vanish from HEAD,
    UNAFFECTED files are not rewritten (same physical identity), NULL
    predicates keep their rows (SQL DELETE ternary semantics), pre-delete
    snapshots still see everything until expire physically purges, and
    the incremental append scan refuses to cross the delete."""
    out = tempfile.mkdtemp(prefix="snap_del_")
    try:
        pre = S.list_data_files(out)
        _write_batch(spark, out, [("A", 1), ("A", 10)])
        s1, post1 = _commit_delta(out, pre)
        _write_batch(spark, out, [("B", 2), ("B", None)])
        s2, _ = _commit_delta(out, post1)
        files_before = set(S.resolve_files(out, "nodes"))

        st = S.delete_where(spark, out, "x >= 10", tables=("nodes",))
        assert st["deleted_rows"] == 1 and st["files_rewritten"] == 1
        head = S.read_table_at(spark, out, "nodes").collect()
        assert sorted([(r["idspace"], r["x"]) for r in head], key=str) == sorted(
            [("A", 1), ("B", 2), ("B", None)], key=str
        )
        # files without matches keep their identity (B's leaf, and any A
        # part not holding the deleted row, are never rewritten)
        files_after = set(S.resolve_files(out, "nodes"))
        b_files = {f for f in files_before if "idspace=B" in f}
        assert b_files <= files_after

        # time travel: pre-delete snapshot still sees the deleted row
        tt = S.read_table_at(spark, out, "nodes", snapshot_id=s2["snapshot_id"])
        assert sorted(r["x"] for r in tt.collect() if r["x"] is not None) == [1, 2, 10]
        # incremental scan across the delete is undefined
        with pytest.raises(ValueError, match="non-append"):
            S.incremental_files(out, "nodes", s1["snapshot_id"])

        # no-match delete commits nothing
        st2 = S.delete_where(spark, out, "x >= 999", tables=("nodes",))
        assert st2["snapshot_id"] is None
        assert S.current_snapshot_id(out) == st["snapshot_id"]

        # summary surfaces in the metadata table
        meta = {r["snapshot_id"]: r for r in S.snapshots_table(spark, out).collect()}
        assert meta[st["snapshot_id"]]["op"] == "delete"
        assert meta[st["snapshot_id"]]["summary"]["nodes_deleted_rows"] == 1

        # physical purge = delete + expire (takedown compliance)
        st3 = S.expire_snapshots(out, keep_last=1)
        assert st3["deleted_files"] >= 1
        assert sorted(r["x"] for r in S.read_table_at(spark, out, "nodes").collect() if r["x"] is not None) == [1, 2]
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_merge_into_copy_on_write(spark):
    """merge_into = Iceberg CoW MERGE: every target row whose key appears
    in the source is replaced by the source's row-set for that key
    (update as delete+reinsert), unmatched source keys insert, NULL keys
    never match (target NULL-key rows survive; source NULL-key rows are
    pure inserts), unaffected files keep their physical identity, time
    travel sees the pre-merge state, and the incremental append scan
    refuses to cross the overwrite."""
    out = tempfile.mkdtemp(prefix="snap_mrg_")
    try:
        pre = S.list_data_files(out)
        _write_batch(spark, out, [("A", 1), ("A", 10)])
        s1, post1 = _commit_delta(out, pre)
        _write_batch(spark, out, [("B", 2), ("B", None), ("A", 10)])
        s2, _ = _commit_delta(out, post1)
        files_before = set(S.resolve_files(out, "nodes"))

        src = spark.createDataFrame(
            [("C", 10), ("D", 77), ("E", None)], "idspace string, x int"
        )
        st = S.merge_into(spark, out, "nodes", src, on="x")
        # x=10 lived in two files (one per batch) with two rows total
        assert st["matched_rows"] == 2 and st["files_rewritten"] == 2
        head = S.read_table_at(spark, out, "nodes").collect()
        assert sorted([(r["idspace"], r["x"]) for r in head], key=str) == sorted(
            [("A", 1), ("B", 2), ("B", None), ("C", 10), ("D", 77), ("E", None)], key=str
        )
        # B's leaf held no matched key: physical identity preserved
        files_after = set(S.resolve_files(out, "nodes"))
        b_files = {f for f in files_before if "idspace=B" in f}
        assert b_files <= files_after

        # time travel: pre-merge snapshot still sees the replaced rows
        tt = S.read_table_at(spark, out, "nodes", snapshot_id=s2["snapshot_id"])
        assert sorted(r["x"] for r in tt.collect() if r["x"] is not None) == [1, 2, 10, 10]
        # incremental scan across the overwrite is undefined
        with pytest.raises(ValueError, match="non-append"):
            S.incremental_files(out, "nodes", s1["snapshot_id"])
        # summary surfaces in the metadata table
        meta = {r["snapshot_id"]: r for r in S.snapshots_table(spark, out).collect()}
        assert meta[st["snapshot_id"]]["op"] == "overwrite"
        assert meta[st["snapshot_id"]]["summary"]["nodes_matched_rows"] == 2

        # a column the source adds is add-column evolution: survivors of
        # rewritten files get NULL, HEAD reads merge, old snapshots keep
        # the old schema
        src2 = spark.createDataFrame([("F", 77, 9)], "idspace string, x int, y int")
        S.merge_into(spark, out, "nodes", src2, on="x")
        head2 = S.read_table_at(spark, out, "nodes")
        assert "y" in head2.columns
        got = {(r["idspace"], r["x"]): r["y"] for r in head2.collect()}
        assert got[("F", 77)] == 9 and got[("A", 1)] is None
        assert "y" not in S.read_table_at(spark, out, "nodes", snapshot_id=s2["snapshot_id"]).columns

        # physical purge of replaced files; HEAD counts unchanged
        S.expire_snapshots(out, keep_last=1)
        assert S.read_table_at(spark, out, "nodes").count() == 6
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_merge_into_op_semantics_and_edge_cases(spark):
    """Snapshot-op contract: a pure insert commits op='append' (the
    incremental scan keeps working across it), a fully-empty merge
    commits NOTHING, a multi-column key exercises the semi-join probe
    (no value pushdown), an emptied table falls back to the known
    partition spec instead of writing flat, and an empty key list is an
    up-front ValueError."""
    out = tempfile.mkdtemp(prefix="snap_mrg2_")
    try:
        pre = S.list_data_files(out)
        _write_batch(spark, out, [("A", 1), ("B", 2)])
        s1, _ = _commit_delta(out, pre)

        with pytest.raises(ValueError, match="at least one merge key"):
            S.merge_into(spark, out, "nodes", spark.createDataFrame([("A", 1)], "idspace string, x int"), on=[])

        # pure insert: no key matches → op=append, incremental scan OK
        ins = spark.createDataFrame([("C", 30)], "idspace string, x int")
        st = S.merge_into(spark, out, "nodes", ins, on="x")
        assert st["matched_rows"] == 0 and st["files_rewritten"] == 0
        meta = {r["snapshot_id"]: r for r in S.snapshots_table(spark, out).collect()}
        assert meta[st["snapshot_id"]]["op"] == "append"
        inc = S.read_incremental(spark, out, "nodes", s1["snapshot_id"])
        assert [(r["idspace"], r["x"]) for r in inc.collect()] == [("C", 30)]

        # fully-empty merge: nothing matched, nothing inserted → no commit
        empty = spark.createDataFrame([], "idspace string, x int")
        st2 = S.merge_into(spark, out, "nodes", empty, on="x")
        assert st2["snapshot_id"] is None
        assert S.current_snapshot_id(out) == st["snapshot_id"]

        # multi-column key → semi-join probe path, same row semantics
        src = spark.createDataFrame([("C", 30), ("D", 40)], "idspace string, x int")
        st3 = S.merge_into(spark, out, "nodes", src, on=["idspace", "x"])
        assert st3["matched_rows"] == 1 and st3["files_rewritten"] == 1
        head = sorted((r["idspace"], r["x"]) for r in S.read_table_at(spark, out, "nodes").collect())
        assert head == [("A", 1), ("B", 2), ("C", 30), ("D", 40)]

        # empty the table, then insert: the rewrite must keep the
        # partitioned layout (TABLE_PARTITIONS fallback), not write flat
        S.delete_where(spark, out, "x IS NOT NULL", tables=("nodes",))
        assert S.read_table_at(spark, out, "nodes").count() == 0
        st4 = S.merge_into(
            spark, out, "nodes", spark.createDataFrame([("E", 5)], "idspace string, x int"), on="x"
        )
        assert all(rel.startswith("nodes/idspace=E/") for rel in
                   S.resolve_files(out, "nodes")), S.resolve_files(out, "nodes")
        rows = S.read_table_at(spark, out, "nodes").collect()
        assert [(r["idspace"], r["x"]) for r in rows] == [("E", 5)]
        assert meta_op(spark, out, st4["snapshot_id"]) == "append"
    finally:
        shutil.rmtree(out, ignore_errors=True)


def meta_op(spark, out, sid):
    rows = {r["snapshot_id"]: r["op"] for r in S.snapshots_table(spark, out).collect()}
    return rows[sid]


def test_equality_delete_merge_on_read(spark):
    """equality_delete = Iceberg v2 MoR: the takedown commits a tiny
    key file (NO data-file rewrites — file set identity preserved),
    reads mask matching rows with the sequence rule (a re-insert AFTER
    the delete is visible), maintenance that would re-sequence files
    refuses until materialize_deletes folds the masks in, and after
    materialization reads are plain scans, history expires, and the
    delete file is reaped."""
    out = tempfile.mkdtemp(prefix="snap_mor_")
    try:
        pre = S.list_data_files(out)
        _write_batch(spark, out, [("A", 1), ("A", 10), ("B", 2)])
        s1, post1 = _commit_delta(out, pre)
        files_before = set(S.resolve_files(out, "nodes"))

        eq = S.equality_delete(spark, out, "x >= 10", keys=("x",), tables=("nodes",))
        assert eq["deleted_keys"] == 1
        # masked on read, zero data files touched
        assert set(S.resolve_files(out, "nodes")) == files_before
        assert sorted(r["x"] for r in S.read_table_at(spark, out, "nodes").collect()) == [1, 2]
        # time travel to pre-delete still sees the masked row
        tt = S.read_table_at(spark, out, "nodes", snapshot_id=s1["snapshot_id"])
        assert sorted(r["x"] for r in tt.collect()) == [1, 2, 10]

        # sequence rule: a LATER re-insert of the deleted key is visible
        # (the eq-delete file lives outside the table dirs, so post1 is
        # still the correct pre-write baseline for this data commit)
        _write_batch(spark, out, [("C", 10)])
        _commit_delta(out, post1)
        head = sorted((r["idspace"], r["x"]) for r in S.read_table_at(spark, out, "nodes").collect())
        assert head == [("A", 1), ("B", 2), ("C", 10)]

        # incremental refuses across the delete; maintenance refuses
        # until materialization
        with pytest.raises(ValueError, match="non-append"):
            S.incremental_files(out, "nodes", s1["snapshot_id"])
        with pytest.raises(ValueError, match="materialize"):
            S.rewrite_data_files(spark, out, tables=("nodes",), max_parts=0)
        with pytest.raises(ValueError, match="materialize"):
            S.delete_where(spark, out, "x < 0", tables=("nodes",))
        with pytest.raises(ValueError, match="materialize"):
            S.expire_snapshots(out, keep_last=1)

        st = S.materialize_deletes(spark, out, tables=("nodes",))
        # only the ONE file holding the masked row is rewritten; C's
        # file holds x=10 too but the delete doesn't apply to it
        assert st["files_rewritten"] == 1
        assert sorted((r["idspace"], r["x"]) for r in S.read_table_at(spark, out, "nodes").collect()) == head
        # incremental works across the materialization (op=replace)
        # for ranges that don't cross the eq-delete itself
        mid = S.snapshots_table(spark, out).collect()
        # maintenance unblocked; expire itself reaps the folded delete
        # file (ADVICE r5: the takedown's KEY parquet must not linger
        # readable after the two-step purge recipe) — no separate
        # remove_orphan_files run needed
        S.expire_snapshots(out, keep_last=1)
        eq_root = os.path.join(out, S.EQ_DELETE_DIR)
        leftover = [
            f for _d, _s, fs in os.walk(eq_root) for f in fs if f.endswith(".parquet")
        ] if os.path.isdir(eq_root) else []
        assert leftover == [], f"eq-delete key files lingered: {leftover}"
        assert S.remove_orphan_files(out, tables=("nodes",)) == 0
        assert sorted((r["idspace"], r["x"]) for r in S.read_table_at(spark, out, "nodes").collect()) == head
        assert mid  # metadata table renders the eq-delete op
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_cow_delete_and_sort_rewrite_evolution_edge_cases(spark):
    """Fourth-pass review fixes: (1) a CoW delete whose predicate
    references a schema-evolution column works even when every affected
    file predates the column (phase 2 backfills NULLs like phase 1's
    merged read); (2) rewrite sort_by tolerates partition-key columns
    (constant within a leaf — dropped from the effective order instead
    of failing analysis); (3) compact_outputs refuses over a staged
    branch (it would absorb unaudited rows into main)."""
    from fastobo_py_spark.plans.pipeline import compact_outputs

    out = tempfile.mkdtemp(prefix="snap_evo_")
    try:
        pre = S.list_data_files(out)
        _write_batch(spark, out, [("A", 1), ("A", 2)])
        s1, post1 = _commit_delta(out, pre)
        # evolution batch adds y
        spark.createDataFrame([("B", 3, 7)], "idspace string, x int, y int").write.mode(
            "append"
        ).partitionBy("idspace").parquet(f"{out}/nodes")
        s2, post2 = _commit_delta(out, post1)

        # (1) predicate on y: affected = ONLY pre-evolution files (y NULL
        # reads as matching 'y IS NULL'); their rescan must not fail
        st = S.delete_where(spark, out, "y IS NULL AND x = 1", tables=("nodes",))
        assert st["deleted_rows"] == 1
        got = sorted((r["idspace"], r["x"]) for r in S.read_table_at(spark, out, "nodes").collect())
        assert got == [("A", 2), ("B", 3)]

        # (2) sort_by including the partition column neither crashes nor
        # changes rows
        st2 = S.rewrite_data_files(
            spark, out, tables=("nodes",), max_parts=1024, sort_by=["idspace", "x"]
        )
        assert st2["leaves_rewritten"] >= 1
        assert sorted(
            (r["idspace"], r["x"]) for r in S.read_table_at(spark, out, "nodes").collect()
        ) == got

        # (3) destructive compaction refuses over a staged branch
        _write_batch(spark, out, [("C", 9)])
        _commit_delta(out, S.list_data_files(out), branch="wip")  # empty delta is fine
        with pytest.raises(ValueError, match="staged branch"):
            compact_outputs(spark, out, max_parts=0)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_equality_delete_hardening(spark):
    """Code-review r5 MoR contracts: (1) a repeat takedown harvests keys
    from the MASKED view — a key matched only by an already-masked row
    is not re-committed at a newer sequence, so the re-inserted row
    survives; (2) a delete keyed on a schema-evolution column reads
    missing columns as NULL (Iceberg's rule) instead of failing every
    read; (3) history SPANNING an eq-delete→materialize pair expires
    fine with a big-enough keep_last (interior deltas keep real
    sequence numbers), with time travel into the masked era intact."""
    out = tempfile.mkdtemp(prefix="snap_morh_")
    try:
        pre = S.list_data_files(out)
        _write_batch(spark, out, [("A", 1), ("A", 10)])
        s1, post1 = _commit_delta(out, pre)
        S.equality_delete(spark, out, "x >= 10", keys=("x",), tables=("nodes",))
        _write_batch(spark, out, [("C", 10)])
        s2, post2 = _commit_delta(out, post1)

        # (1) predicate matches ONLY rows already masked or (A,1):
        # harvested keys must be {1}, never the masked row's 10
        S.equality_delete(spark, out, "idspace = 'A'", keys=("x",), tables=("nodes",))
        head = sorted((r["idspace"], r["x"]) for r in S.read_table_at(spark, out, "nodes").collect())
        assert head == [("C", 10)], head

        # (2) evolution column: new batch carries y; older files read
        # y as NULL and stay unmasked — no AnalysisException
        spark.createDataFrame([("D", 5, 9)], "idspace string, x int, y int").write.mode(
            "append"
        ).partitionBy("idspace").parquet(f"{out}/nodes")
        _commit_delta(out, post2)
        S.equality_delete(spark, out, "y = 9", keys=("y",), tables=("nodes",))
        head = sorted((r["idspace"], r["x"]) for r in S.read_table_at(spark, out, "nodes").collect())
        assert head == [("C", 10)], head

        st = S.materialize_deletes(spark, out, tables=("nodes",))
        assert st["files_rewritten"] >= 2
        # (3) retain ALL history across the delete era and expire: the
        # boundary (s1) has no pending deletes, interior eq-delete
        # snapshots keep their sequences, time travel stays masked
        S.expire_snapshots(out, keep_last=10)
        assert sorted(
            (r["idspace"], r["x"]) for r in S.read_table_at(spark, out, "nodes").collect()
        ) == [("C", 10)]
        tt = S.read_table_at(spark, out, "nodes", snapshot_id=s2["snapshot_id"])
        assert sorted((r["idspace"], r["x"]) for r in tt.collect()) == [("A", 1), ("C", 10)]
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_wap_branch_write_audit_publish(spark):
    """Branch refs (Iceberg WAP): commits to a branch stay invisible to
    HEAD readers, fast_forward publishes atomically (and refuses a
    divergent main), delete_branch + expire reclaims an abandoned audit,
    and a live branch head survives expiration as a pin."""
    out = tempfile.mkdtemp(prefix="snap_wap_")
    try:
        pre = S.list_data_files(out)
        _write_batch(spark, out, [("A", 1)])
        s1, post1 = _commit_delta(out, pre)

        # write to the audit branch (auto-created, cut from main)
        _write_batch(spark, out, [("B", 2)])
        b1, post2 = _commit_delta(out, post1, branch="audit")
        _write_batch(spark, out, [("C", 3)])
        b2, post3 = _commit_delta(out, post2, branch="audit")
        assert S.current_snapshot_id(out) == s1["snapshot_id"]  # HEAD untouched
        assert S.read_table_at(spark, out, "nodes").count() == 1
        assert S.read_table_at(spark, out, "nodes", branch="audit").count() == 3
        assert b2["parent_id"] == b1["snapshot_id"] and b1["parent_id"] == s1["snapshot_id"]

        # publish: one pointer move, full audited history becomes main;
        # then drop the merged ref (it would otherwise pin its snapshot
        # through expiration, like a stale git branch)
        assert S.fast_forward(out, "audit") == b2["snapshot_id"]
        assert S.read_table_at(spark, out, "nodes").count() == 3
        S.delete_branch(out, "audit")

        # divergence guard: cut a fix branch, then advance main past it
        _write_batch(spark, out, [("E", 5)])
        f1, post4 = _commit_delta(out, post3, branch="fix")
        _write_batch(spark, out, [("D", 4)])
        s2, _ = _commit_delta(out, post4)
        with pytest.raises(ValueError, match="divergent"):
            S.fast_forward(out, "fix")

        # live branch head survives expiration as a pin...
        res = S.expire_snapshots(out, keep_last=1)
        assert res["pinned_branches"] == {"fix": f1["snapshot_id"]}
        assert S.read_table_at(spark, out, "nodes", branch="fix").count() == 4  # A,B,C + E
        # ...and abandoning it lets the next expire reclaim its files
        S.delete_branch(out, "fix")
        res2 = S.expire_snapshots(out, keep_last=1)
        assert res2["pinned_branches"] == {} and res2["deleted_files"] >= 1
        assert sorted(r["x"] for r in S.read_table_at(spark, out, "nodes").collect()) == [1, 2, 3, 4]
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_wap_branch_first_dir_and_expire_survival(spark):
    """Three WAP hardening contracts (code-review r5): (1) a branch-only
    dir (first batch staged, no main commit) is NOT 'imported' into main
    by the next writer's entry hygiene — HEAD readers keep seeing
    nothing; (2) a staged branch remains publishable AFTER
    expire_snapshots (the branch head is rebased onto its surviving main
    ancestor, not severed to a root); (3) with no main commit at all, an
    abandoned branch is still reclaimable by expire."""
    out = tempfile.mkdtemp(prefix="snap_wapx_")
    try:
        pre = S.list_data_files(out)
        _write_batch(spark, out, [("A", 1)])
        b1, post1 = _commit_delta(out, pre, branch="audit")
        # (1) second-writer entry hygiene: no import of unaudited files
        S.ensure_baseline(out)
        assert S.current_snapshot_id(out) is None
        assert S.read_table_at(spark, out, "nodes").count() == 0
        assert S.fast_forward(out, "audit") == b1["snapshot_id"]
        S.delete_branch(out, "audit")
        assert S.read_table_at(spark, out, "nodes").count() == 1

        # (2) stage, expire, THEN publish — must not read as divergent
        _write_batch(spark, out, [("B", 2)])
        b2, _ = _commit_delta(out, post1, branch="audit2")
        S.expire_snapshots(out, keep_last=1)
        assert S.read_table_at(spark, out, "nodes", branch="audit2").count() == 2
        assert S.fast_forward(out, "audit2") == b2["snapshot_id"]
        assert S.read_table_at(spark, out, "nodes").count() == 2
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_expire_reclaims_abandoned_branch_without_main(spark):
    """A fresh dir whose ONLY history is an abandoned staged branch:
    delete_branch + expire must reclaim both the snapshot JSONs and the
    data files even though main never committed (expire used to
    early-return on HEAD=None and leak the batch forever)."""
    out = tempfile.mkdtemp(prefix="snap_wap0_")
    try:
        pre = S.list_data_files(out)
        _write_batch(spark, out, [("A", 1), ("B", 2)])
        _commit_delta(out, pre, branch="audit")
        S.delete_branch(out, "audit")
        res = S.expire_snapshots(out, keep_last=1)
        assert res["expired"] >= 1 and res["deleted_files"] >= 1
        assert S.list_snapshots(out) == []
        assert not any(S.list_data_files(out).values())
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_rewrite_data_files_sort_strategy(spark):
    """sort_by = Iceberg's SORT rewrite strategy: every leaf is
    re-clustered so each output file covers a disjoint value range
    (parquet footer min/max then prune point probes to one file — what
    makes delete/merge by doc_sha scale by the delta). Rows, snapshot
    history and the incremental append scan are all preserved."""
    import pyarrow.parquet as pq

    out = tempfile.mkdtemp(prefix="snap_sort_")
    try:
        pre = S.list_data_files(out)
        _write_batch(spark, out, [("A", v) for v in (9, 1, 7, 3)])
        s1, post1 = _commit_delta(out, pre)
        _write_batch(spark, out, [("A", v) for v in (8, 2, 6, 4)])
        s2, _ = _commit_delta(out, post1)

        st = S.rewrite_data_files(
            spark, out, tables=("nodes",), max_parts=1024, target_bytes=1000, sort_by=["x"]
        )
        # sort strategy rewrites even unfragmented leaves (max_parts huge)
        assert st["leaves_rewritten"] == 1 and st["parts_after"] >= 2

        head = S.read_table_at(spark, out, "nodes")
        assert sorted(r["x"] for r in head.collect()) == [1, 2, 3, 4, 6, 7, 8, 9]
        # each post-rewrite file covers a disjoint x range
        ranges = []
        for rel in S.resolve_files(out, "nodes"):
            md = pq.ParquetFile(os.path.join(out, rel)).metadata
            stats = [md.row_group(i).column(0).statistics for i in range(md.num_row_groups)]
            if stats:
                ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
        ranges.sort()
        assert len(ranges) >= 2
        for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2, ranges
        # replace snapshot: incremental append scan still skips it
        inc = S.read_incremental(spark, out, "nodes", s1["snapshot_id"])
        assert sorted(r["x"] for r in inc.collect()) == [2, 4, 6, 8]
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_tags_pin_snapshots_through_expiration(spark):
    """Tags (Iceberg refs): read_table_at(tag=...) resolves the pinned
    snapshot; expire_snapshots RETAINS tagged snapshots and their files
    regardless of keep_last (rebased to roots); re-tagging moves the
    name; deleting the tag releases the pin."""
    out = tempfile.mkdtemp(prefix="snap_tag_")
    try:
        pre = S.list_data_files(out)
        _write_batch(spark, out, [("A", 1)])
        s1, post1 = _commit_delta(out, pre)
        S.create_tag(out, "prod")  # defaults to HEAD == s1
        _write_batch(spark, out, [("A", 2)])
        s2, post2 = _commit_delta(out, post1)
        _write_batch(spark, out, [("A", 3)])
        s3, _ = _commit_delta(out, post2)

        assert S.resolve_tag(out, "prod") == s1["snapshot_id"]
        assert [r["x"] for r in S.read_table_at(spark, out, "nodes", tag="prod").collect()] == [1]

        # expire to HEAD only: s2 dies, tagged s1 survives as a root —
        # and the return REPORTS the pin (the takedown-compliance signal)
        st = S.expire_snapshots(out, keep_last=1)
        assert st["expired"] == 1
        assert st["pinned_tags"] == {"prod": s1["snapshot_id"]}
        assert [r["x"] for r in S.read_table_at(spark, out, "nodes", tag="prod").collect()] == [1]
        assert S.read_table_at(spark, out, "nodes").count() == 3
        with pytest.raises(ValueError):
            S.resolve_files(out, "nodes", s2["snapshot_id"])

        # promotion: re-tag to HEAD, drop the pin, expire again → s1 goes
        S.create_tag(out, "prod", s3["snapshot_id"])
        st2 = S.expire_snapshots(out, keep_last=1)
        assert st2["expired"] == 1  # s1 no longer pinned
        with pytest.raises(ValueError):
            S.read_table_at(spark, out, "nodes", tag="missing")
        S.delete_tag(out, "prod")
        with pytest.raises(ValueError):
            S.resolve_tag(out, "prod")
        # guard rails
        with pytest.raises(ValueError):
            S.create_tag(out, "x", "nonexistent000")
        with pytest.raises(ValueError):
            S.create_tag(out, "")  # unset-$VAR wrapper bug → loud failure
        with pytest.raises(ValueError):
            S.read_table_at(spark, out, "nodes", tag="t", snapshot_id=s3["snapshot_id"])

        # the DESTRUCTIVE compactor refuses while tags exist — it would
        # strand them pointing at deleted files (code-review r5)
        from fastobo_py_spark.plans.pipeline import compact_outputs

        S.create_tag(out, "pin")
        with pytest.raises(ValueError, match="strand"):
            compact_outputs(spark, out, max_parts=0)
        S.delete_tag(out, "pin")
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_metadata_tables(spark):
    """snapshots_table / files_table metadata views (Iceberg's
    table$snapshots / table$files): current flag, delta counts, per-file
    sizes, and historical file sets by snapshot id."""
    out = tempfile.mkdtemp(prefix="snap_meta_")
    try:
        pre = S.list_data_files(out)
        _write_batch(spark, out, [("A", 1)])
        s1, post1 = _commit_delta(out, pre)
        _write_batch(spark, out, [("B", 2)])
        s2, post2 = _commit_delta(out, post1)

        meta = S.snapshots_table(spark, out).collect()
        assert [r["snapshot_id"] for r in meta] == [s2["snapshot_id"], s1["snapshot_id"]]
        assert [r["is_current"] for r in meta] == [True, False]
        assert all(r["added_files"]["nodes"] >= 1 for r in meta)

        files_head = S.files_table(spark, out).collect()
        files_s1 = S.files_table(spark, out, snapshot_id=s1["snapshot_id"]).collect()
        assert len(files_s1) < len(files_head)
        assert all(r["bytes"] > 0 and r["table"] == "nodes" for r in files_head)
        assert all(r["leaf"].startswith("nodes/idspace=") for r in files_head)

        # refs_table (table$refs): main + tags + branches, with retention
        S.create_tag(out, "prod", s1["snapshot_id"])
        _write_batch(spark, out, [("C", 3)])
        _commit_delta(out, post2, branch="wip")
        refs = {r["name"]: r for r in S.refs_table(spark, out).collect()}
        assert refs["main"]["snapshot_id"] == s2["snapshot_id"]
        assert refs["prod"]["type"] == "tag" and refs["prod"]["snapshot_id"] == s1["snapshot_id"]
        assert refs["wip"]["type"] == "branch" and refs["wip"]["is_retained"]
        assert all(r["is_retained"] for r in refs.values())
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_snapshot_layer_random_walk_model(spark):
    """Model-based random walk over the whole snapshot layer: a seeded
    sequence of append / CoW delete / CoW merge / MoR delete /
    materialize / rewrite(sort|binpack) / expire ops runs against a
    pure-Python model of the visible row set. After every op the HEAD
    read must equal the model; maintenance ops must refuse exactly when
    the model says equality deletes are pending; after every expire,
    every still-retained snapshot must read exactly what it read when it
    committed. Two seeds x 24 ops — the interleavings no hand-written
    test enumerates."""
    import random

    for seed in (7, 23):
        rng = random.Random(seed)
        out = tempfile.mkdtemp(prefix=f"snap_walk{seed}_")
        try:
            visible: list[tuple] = []
            history: dict[str, list] = {}
            pending = False

            def append(rows):
                nonlocal visible
                pre = S.list_data_files(out)
                _write_batch(spark, out, rows)
                s, _ = _commit_delta(out, pre)
                visible = visible + rows
                history[s["snapshot_id"]] = sorted(visible)

            append([(rng.choice("ABC"), rng.randrange(10)) for _ in range(3)])
            for _step in range(24):
                op = rng.choice(
                    ["append", "append", "cow_delete", "merge", "eq_delete",
                     "materialize", "rewrite", "expire"]
                )
                if op == "append":
                    append([(rng.choice("ABC"), rng.randrange(10))
                            for _ in range(rng.randrange(1, 4))])
                elif op == "cow_delete":
                    k = rng.randrange(10)
                    if pending:
                        with pytest.raises(ValueError, match="materialize"):
                            S.delete_where(spark, out, f"x = {k}", tables=("nodes",))
                    else:
                        st = S.delete_where(spark, out, f"x = {k}", tables=("nodes",))
                        visible = [r for r in visible if r[1] != k]
                        if st["snapshot_id"]:
                            history[st["snapshot_id"]] = sorted(visible)
                elif op == "merge":
                    rows = [(rng.choice("ABC"), rng.randrange(10))
                            for _ in range(rng.randrange(1, 3))]
                    src = spark.createDataFrame(rows, "idspace string, x int")
                    if pending:
                        with pytest.raises(ValueError, match="materialize"):
                            S.merge_into(spark, out, "nodes", src, on="x")
                    else:
                        st = S.merge_into(spark, out, "nodes", src, on="x")
                        xs = {x for _i, x in rows}
                        visible = [r for r in visible if r[1] not in xs] + rows
                        if st["snapshot_id"]:
                            history[st["snapshot_id"]] = sorted(visible)
                elif op == "eq_delete":
                    k = rng.randrange(10)
                    st = S.equality_delete(spark, out, f"x = {k}", keys=("x",), tables=("nodes",))
                    if st["snapshot_id"]:
                        pending = True
                        visible = [r for r in visible if r[1] != k]
                        history[st["snapshot_id"]] = sorted(visible)
                elif op == "materialize":
                    st = S.materialize_deletes(spark, out, tables=("nodes",))
                    if st["snapshot_id"]:
                        history[st["snapshot_id"]] = sorted(visible)
                    pending = False
                elif op == "rewrite":
                    sort = rng.choice([None, ["x"]])
                    if pending:
                        with pytest.raises(ValueError, match="materialize"):
                            S.rewrite_data_files(spark, out, tables=("nodes",),
                                                 max_parts=0, sort_by=sort)
                    else:
                        st = S.rewrite_data_files(spark, out, tables=("nodes",),
                                                  max_parts=0, sort_by=sort)
                        if st.get("snapshot_id"):
                            history[st["snapshot_id"]] = sorted(visible)
                elif op == "expire":
                    keep = rng.randrange(1, 4)
                    if pending:
                        # boundary may or may not carry the pending delete
                        # depending on keep depth; accept either refusal or
                        # success, then re-check every retained snapshot
                        try:
                            S.expire_snapshots(out, keep_last=keep)
                        except ValueError as err:
                            assert "pending equality deletes" in str(err)
                    else:
                        S.expire_snapshots(out, keep_last=keep)
                    retained = {s["snapshot_id"] for s in S.list_snapshots(out)}
                    for sid in list(history):
                        if sid not in retained:
                            del history[sid]
                        else:
                            got = sorted(
                                (r["idspace"], r["x"])
                                for r in S.read_table_at(spark, out, "nodes",
                                                         snapshot_id=sid).collect()
                            )
                            assert got == history[sid], (seed, _step, sid)

                got = sorted(
                    (r["idspace"], r["x"])
                    for r in S.read_table_at(spark, out, "nodes").collect()
                )
                assert got == sorted(visible), (seed, _step, op)
        finally:
            shutil.rmtree(out, ignore_errors=True)
