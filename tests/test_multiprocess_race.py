"""Two OS processes racing commits on ONE warehouse directory.

The unit race test (test_warehouse) exercises the pinned-commit
protocol in-process; this one runs two REAL processes — separate JVMs,
separate Warehouse instances, no shared Python state — racing to
ingest the SAME feed into the same table (the HA-ingestor topology:
the feed is one ordered stream, so concurrent writers are redundant
consumers of it, not authors of divergent histories). The protocol's
promise under any interleaving: commits serialize or fail LOUDLY with
ConcurrentCommitError (a loser re-runs and converges; checkpoints
make the replay idempotent by seq), scratch dirs never cross
(the shared `._tmp` name was a real bug this test caught: one
writer's rmtree/publish ate the other's in-flight part files), and
the final table is exactly the feed's latest-wins state.

Boots two extra JVMs (~1 min total).
"""

from __future__ import annotations

import os
import random
import subprocess
import sys

from .fixtures import envelope, person_doc, write_feed

WRITER = r"""
import sys, time
sys.path.insert(0, {repo!r})
from couchwarehouse_spark.session import get_spark
from couchwarehouse_spark.warehouse import ConcurrentCommitError, Warehouse

wh_dir, feed, tag = sys.argv[1], sys.argv[2], sys.argv[3]
spark = get_spark(app_name="race-" + tag, master="local[4]", shuffle_partitions=4)
wh = Warehouse(spark, wh_dir, "racedb", n_buckets=2)
for attempt in range(12):
    try:
        wh.spool(feed)
        print("WRITER_OK", tag, "attempt", attempt, flush=True)
        break
    except ConcurrentCommitError:
        # Loud loser: the contract says re-running the batch converges.
        # The unadvanced checkpoint replays it idempotently by seq.
        time.sleep(0.3)
else:
    raise SystemExit("writer %s never converged" % tag)
"""


def test_two_process_commit_race_converges(spark, tmp_path):
    rng = random.Random(5)
    wh_dir = str(tmp_path / "wh")

    # ONE feed, two redundant consumers — 40 docs, the last 5 also
    # amended at higher seqs so latest-wins is exercised under the race.
    envs = [envelope(i + 1, person_doc(i, rng)) for i in range(40)]
    for j in range(5):
        amended = person_doc(35 + j, rng)
        amended["age"] = 99
        envs.append(envelope(100 + j, amended))
    feed = write_feed(str(tmp_path / "feed.jsonl"), envs)

    script = str(tmp_path / "writer.py")
    with open(script, "w") as f:
        f.write(WRITER.format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, script, wh_dir, feed, tag],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
        )
        for feed, tag in [(feed, "A"), (feed, "B")]
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
        assert "WRITER_OK" in out, out[-3000:]

    # Convergence: the table holds BOTH writers' documents — no lost
    # update under any interleaving — and the manifest log is a clean
    # integer sequence (every retained version readable).
    from couchwarehouse_spark.warehouse import Warehouse

    wh = Warehouse(spark, wh_dir, "racedb", n_buckets=2)
    rows = {r["id"]: r["age"] for r in wh.table().select("id", "age").collect()}
    expect_ids = {f"person{i:04d}" for i in range(40)}
    assert set(rows) == expect_ids, (
        sorted(expect_ids - set(rows))[:5],
        sorted(set(rows) - expect_ids)[:5],
    )
    # Latest-wins survived the race: the amended docs carry the
    # higher-seq age, whichever writer applied them.
    for j in range(5):
        assert rows[f"person{35 + j:04d}"] == 99.0
    versions = [r["version"] for r in wh.history().collect()]
    assert versions == sorted(versions) and len(versions) >= 1
