"""Build-artifact cache behavior (plans/queries._artifact):

- build-once within a process (dict hit),
- cross-process reuse via the on-disk _COMMITTED marker,
- invalidation when a source table is regenerated (stat_token change),
- an unmarked (crashed mid-build) directory is rebuilt, not served.
"""

import pytest

from cdc_makanmana_spark.plans import queries as Q


def _build_counter(spark, calls):
    def build():
        calls.append(1)
        return spark.range(3).toDF("id")

    return build


@pytest.fixture(autouse=True)
def _cleanup_unit_artifacts(spark):
    """Each test's tmp_path gives a fresh fingerprint, so without
    cleanup every pytest run would leave new unit_t* dirs in /tmp.
    Sweep by name prefix on disk (the in-memory dict loses paths when
    tests .clear() it to simulate a new process)."""
    yield
    from cdc_makanmana_spark import fs

    root = Q._artifact_root()
    for child in fs.list_names(spark, root):
        if child.startswith("unit_t"):
            fs.delete(spark, f"{root}/{child}")
    for key in [k for k in Q._ARTIFACTS if k[1].startswith("unit_t")]:
        del Q._ARTIFACTS[key]


def test_artifact_builds_once_and_reuses_committed(spark, tmp_path):
    sf = str(tmp_path)
    (tmp_path / "documents.parquet").write_bytes(b"generation-1")
    calls = []
    build = _build_counter(spark, calls)

    assert Q._artifact(spark, sf, "unit_t", ("documents",), build).count() == 3
    assert len(calls) == 1

    # same process: dict hit, no rebuild
    Q._artifact(spark, sf, "unit_t", ("documents",), build)
    assert len(calls) == 1

    # "new process" (cleared in-memory cache): the committed on-disk
    # artifact is reused, not rebuilt
    Q._ARTIFACTS.clear()
    assert Q._artifact(spark, sf, "unit_t", ("documents",), build).count() == 3
    assert len(calls) == 1


def test_artifact_invalidated_when_source_regenerated(spark, tmp_path):
    sf = str(tmp_path)
    src = tmp_path / "documents.parquet"
    src.write_bytes(b"generation-1")
    calls = []
    build = _build_counter(spark, calls)

    Q._artifact(spark, sf, "unit_t2", ("documents",), build)
    assert len(calls) == 1

    # regenerate the source (different size => different stat token):
    # the stale artifact must NOT be served, in-process or across
    # processes
    src.write_bytes(b"generation-2!")
    Q._artifact(spark, sf, "unit_t2", ("documents",), build)
    assert len(calls) == 2
    Q._ARTIFACTS.clear()
    Q._artifact(spark, sf, "unit_t2", ("documents",), build)
    assert len(calls) == 2


def test_artifact_invalidated_on_param_change_and_old_gen_evicted(spark, tmp_path):
    """A build-parameter bump must invalidate a committed artifact
    (source fingerprints alone can't see code/constant changes), and
    the superseded generation must be evicted from disk — growth is
    bounded at one artifact per (name, sf_dir)."""
    import os

    from cdc_makanmana_spark import fs

    sf = str(tmp_path)
    (tmp_path / "documents.parquet").write_bytes(b"generation-1")
    calls = []
    build = _build_counter(spark, calls)

    Q._artifact(spark, sf, "unit_t4", ("documents",), build, params="m=10")
    assert len(calls) == 1
    old_path = next(p for (_, n, _), p in Q._ARTIFACTS.items() if n == "unit_t4")

    Q._artifact(spark, sf, "unit_t4", ("documents",), build, params="m=12")
    assert len(calls) == 2
    new_path = next(p for (_, n, _), p in Q._ARTIFACTS.items() if n == "unit_t4")
    assert new_path != old_path
    assert not fs.exists(spark, old_path), "superseded generation not evicted"

    # a different sf_dir's artifact must NOT be evicted by this one
    other = tmp_path / "other_sf"
    os.makedirs(other)
    (other / "documents.parquet").write_bytes(b"generation-1")
    Q._artifact(spark, str(other), "unit_t4", ("documents",), build, params="m=12")
    assert len(calls) == 3
    assert fs.exists(spark, new_path), "sibling sf_dir artifact wrongly evicted"


def test_stat_token_directory_stable_and_change_sensitive(spark, tmp_path):
    """Directory tokens must be deterministic across calls (listStatus
    order is not guaranteed — the token sorts) and change when a child
    file is replaced (the Spark-rewrite signature object stores can
    see, where the dir's own stat is useless)."""
    from cdc_makanmana_spark import fs

    d = tmp_path / "tbl.parquet"
    d.mkdir()
    for i in range(5):
        (d / f"part-{i:05d}.parquet").write_bytes(b"x" * (i + 1))

    t1 = fs.stat_token(spark, str(d))
    t2 = fs.stat_token(spark, str(d))
    assert t1 == t2 and t1.startswith("dir:")

    (d / "part-00002.parquet").write_bytes(b"rewritten-much-longer")
    assert fs.stat_token(spark, str(d)) != t1


def test_concurrent_builders_converge_to_one_committed_generation(spark, tmp_path):
    """Two PROCESSES building the same fingerprint at the same instant:
    write-once + marker-last must converge to one committed, readable
    generation (last writer wins; the loser's work is simply replaced —
    rebuilds are idempotent by the fingerprint contract). This is the
    documented residual risk of the commit-marker protocol vs a real
    transaction log — prove the convergence claim."""
    import os
    import subprocess
    import sys
    import time

    sf = str(tmp_path)
    (tmp_path / "documents.parquet").write_bytes(b"generation-1")

    sentinel = str(tmp_path / "in_build")
    main_done = str(tmp_path / "main_committed")
    script = tmp_path / "builder.py"
    script.write_text(
        "import os, pathlib, sys, time\n"
        f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})\n"
        "from cdc_makanmana_spark.session import get_spark\n"
        "from cdc_makanmana_spark.plans import queries as Q\n"
        "spark = get_spark('unit-concurrent-builder')\n"
        "def build():\n"
        f"    pathlib.Path({sentinel!r}).touch()  # signal: race window open\n"
        "    # hold the window open until the MAIN process has committed\n"
        "    # (sentinel handshake, not a timed sleep — a loaded box must\n"
        "    # not let the two writes overlap nondeterministically)\n"
        "    deadline = time.time() + 120\n"
        f"    while not os.path.exists({main_done!r}):\n"
        "        if time.time() > deadline:\n"
        "            raise RuntimeError('main process never committed')\n"
        "        time.sleep(0.2)\n"
        "    return spark.range(3).toDF('id')\n"
        f"df = Q._artifact(spark, {sf!r}, 'unit_trace', ('documents',), build)\n"
        "print('ROWS', df.count(), flush=True)\n"
    )
    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    proc = subprocess.Popen(
        [sys.executable, str(script)],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        env=env,
    )
    try:
        # overlap deterministically: wait until the subprocess is INSIDE
        # its build of the same fingerprint, then build here (fast) —
        # this process commits first, the subprocess overwrites after
        deadline = time.time() + 120
        while not os.path.exists(sentinel):
            assert proc.poll() is None, "builder subprocess died early"
            assert time.time() < deadline, "subprocess never entered build"
            time.sleep(0.5)
        calls = []
        df = Q._artifact(spark, sf, "unit_trace", ("documents",), _build_counter(spark, calls))
        assert df.count() == 3 and len(calls) == 1
        open(main_done, "w").close()  # release the subprocess's build
        out, _ = proc.communicate(timeout=180)
        assert proc.returncode == 0 and "ROWS 3" in out  # loser also served
    finally:
        if proc.poll() is None:
            proc.kill()

    from cdc_makanmana_spark import fs

    root = Q._artifact_root()
    gens = [n for n in fs.list_names(spark, root) if n.startswith("unit_trace_")]
    assert len(gens) == 1  # one generation, not one per builder
    path = f"{root}/{gens[0]}"
    assert fs.is_committed(spark, path)
    # the surviving generation is complete and readable from a cold cache
    Q._ARTIFACTS.clear()
    assert Q._artifact(
        spark, sf, "unit_trace", ("documents",), _build_counter(spark, [])
    ).count() == 3


def test_artifact_unmarked_dir_is_rebuilt(spark, tmp_path):
    """A crash between the parquet write and mark_committed leaves an
    unmarked directory — the next request rebuilds instead of serving
    the torn output."""
    from cdc_makanmana_spark import fs

    sf = str(tmp_path)
    (tmp_path / "documents.parquet").write_bytes(b"generation-1")
    calls = []
    build = _build_counter(spark, calls)

    Q._artifact(spark, sf, "unit_t3", ("documents",), build)
    path = next(p for (_, n, _), p in Q._ARTIFACTS.items() if n == "unit_t3")
    assert len(calls) == 1

    # simulate the crash window: drop the marker, clear the dict
    fs.delete(spark, f"{path}/{fs.COMMIT_MARKER}")
    Q._ARTIFACTS.clear()
    Q._artifact(spark, sf, "unit_t3", ("documents",), build)
    assert len(calls) == 2
    assert fs.is_committed(spark, path)
