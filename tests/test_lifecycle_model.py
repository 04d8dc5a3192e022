"""Randomized lifecycle model test: a seeded random schedule of txn
appends, deletes, and compactions — with crashes injected at random
protocol points and then recovered — must leave the corpus equal to a
pure-Python model (the dedup + delete semantics re-implemented on sets)
and pass the deep fsck. The point-targeted crash-injection suites cover
each protocol point once; this covers their INTERLEAVINGS."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from bambooai_spark.operators import writer
from bambooai_spark.operators.writer import (
    append_corpus_txn,
    compact_corpus,
    delete_from_corpus,
    read_corpus,
    recover_staging,
    validate_corpus,
)


def _norm(text: str) -> str:
    return " ".join(text.split()).strip().lower()


class Model:
    """Executable spec: dict fp -> (doc_id, lang, text) of live docs."""

    def __init__(self):
        self.live: dict[str, tuple] = {}

    def append(self, rows):
        batch: dict[str, tuple] = {}
        for doc_id, lang, text in sorted(rows):
            fp = _norm(text)
            if fp not in batch:  # min-id representative within the batch
                batch[fp] = (doc_id, lang, text)
        for fp, row in batch.items():
            if fp not in self.live:  # ledger anti-join across history
                self.live[fp] = row

    def delete(self, doc_ids):
        self.live = {
            fp: row for fp, row in self.live.items() if row[0] not in doc_ids
        }
        # fingerprints leave the ledger too → re-appendable (modeled by
        # simply removing from live; append() re-admits)

    def update(self, doc_ids, make_text):
        """In-place text rewrite: the old fingerprint leaves (the old
        content is re-appendable), the new one enters — exactly the
        update_corpus ledger swap. make_text must keep texts unique
        across docs (the schedule's transform embeds the doc id)."""
        new: dict[str, tuple] = {}
        for fp, (i, lang, text) in self.live.items():
            if i in doc_ids:
                t2 = make_text(i, text)
                new[_norm(t2)] = (i, lang, t2)
            else:
                new[fp] = (i, lang, text)
        self.live = new

    def rows(self):
        return {(r[0], r[1], _norm(r[2])) for r in self.live.values()}


def _mk_docs(spark, rows):
    return spark.createDataFrame(
        [(i, lang, "web", text) for i, lang, text in rows],
        "doc_id long, lang string, source string, text string",
    )


def _corpus_rows(spark, out):
    return {
        (r["doc_id"], r["lang"], _norm(r["text"]))
        for r in read_corpus(spark, out)
        .select("doc_id", "lang", "text")
        .collect()
    }


@pytest.mark.parametrize("seed", [7, 23, 99])
def test_random_schedule_with_crashes(spark, tmp_path, monkeypatch, seed):
    from bambooai_spark.operators.filestats import enable_file_stats

    rng = random.Random(seed)
    out = str(tmp_path / f"corpus_{seed}")
    # stats ride every schedule: the final deep fsck's file_stats check
    # asserts full coverage survives crashes, recoveries, deletes, and
    # compactions (the per-op healing paths, exercised at random)
    enable_file_stats(spark, out, ["doc_id"])
    model = Model()
    next_id = 0
    next_batch = 0
    orig_move = writer._move_staged_files

    class InjectedCrash(RuntimeError):
        """Sentinel: ONLY the injection raises this — a genuine writer
        protocol RuntimeError (frozen-batch guards, rename failures)
        must fail the test, not slip into the recover path."""


    def gen_rows(n):
        nonlocal next_id
        rows = []
        for _ in range(n):
            # ~25 % duplicate an existing text (exercises the ledger)
            if model.live and rng.random() < 0.25:
                dup = rng.choice(list(model.live.values()))[2]
                rows.append((next_id, rng.choice(["en", "de"]), dup))
            else:
                rows.append(
                    (
                        next_id,
                        rng.choice(["en", "de"]),
                        f"lifecycle document {seed}-{next_id} "
                        + "payload " * rng.randint(3, 8),
                    )
                )
            next_id += 1
        return rows

    def with_maybe_crash(fn, *args, **kw):
        """Run an op; ~50 % of the time crash it at a random staged-file
        move, then recover and re-run."""
        nonlocal_crash = rng.random() < 0.5
        if not nonlocal_crash:
            return fn(*args, **kw)
        state = {"left": rng.randint(1, 2)}

        def crashing_move(sp, src, dest, bid, **mkw):
            state["left"] -= 1
            if state["left"] == 0:
                raise InjectedCrash("injected lifecycle crash")
            return orig_move(sp, src, dest, bid, **mkw)

        monkeypatch.setattr(writer, "_move_staged_files", crashing_move)
        try:
            return fn(*args, **kw)  # may complete if few move calls
        except InjectedCrash:
            pass
        finally:
            monkeypatch.setattr(writer, "_move_staged_files", orig_move)
        recover_staging(spark, out)
        return fn(*args, **kw)  # replay/rerun resumes idempotently

    from bambooai_spark.operators.filestats import consolidate_file_stats

    from bambooai_spark.operators.writer import update_corpus

    for _step in range(8):
        op = rng.choice(
            ["append", "append", "delete", "update", "compact",
             "consolidate"]
        )
        if op == "append" or not model.live:
            rows = gen_rows(rng.randint(3, 10))
            bid = next_batch
            next_batch += 1
            with_maybe_crash(
                append_corpus_txn, _mk_docs(spark, rows), out, bid
            )
            model.append(rows)
        elif op == "delete":
            victims = {
                r[0]
                for r in rng.sample(
                    list(model.live.values()),
                    k=min(2, len(model.live)),
                )
            }
            pred = F.col("doc_id").isin(*victims)
            with_maybe_crash(delete_from_corpus, spark, out, pred)
            model.delete(victims)
        elif op == "update":
            victims = {
                r[0]
                for r in rng.sample(
                    list(model.live.values()),
                    k=min(2, len(model.live)),
                )
            }
            # the step marker makes the crash-recovery RERUN a no-op
            # (already-updated rows no longer match), mirroring how
            # delete's rerun finds its rows already gone — and keeps
            # new texts unique so fingerprints never collide
            marker = f"updated {seed}-{_step} "
            pred = F.col("doc_id").isin(*victims) & ~F.col(
                "text"
            ).startswith(marker)
            with_maybe_crash(
                update_corpus, spark, out, pred,
                {"text": F.concat(F.lit(marker), F.col("text"))},
            )
            model.update(victims, lambda i, t: marker + t)
        elif op == "consolidate":
            # bookkeeping-only fold of the stats history: model-invisible
            # by definition, and every later pruned read must stay exact
            consolidate_file_stats(spark, out)
        else:
            with_maybe_crash(compact_corpus, spark, out)
        if model.live and rng.random() < 0.5:
            # pruning-under-interleaving probe: a selective stats-pruned
            # read must equal the model at EVERY intermediate state —
            # whatever mix of deltas/consolidated docs/rewrites exists
            cut = rng.choice(sorted(r[0] for r in model.live.values()))
            got = {
                (r["doc_id"], r["lang"], _norm(r["text"]))
                for r in read_corpus(
                    spark, out, where=[("doc_id", "<=", cut)]
                ).select("doc_id", "lang", "text").collect()
            }
            want = {t for t in model.rows() if t[0] <= cut}
            assert got == want, (cut, got ^ want)

    assert _corpus_rows(spark, out) == model.rows()
    v = {
        r["check"]: r.asDict()
        for r in validate_corpus(spark, out, deep=True).collect()
    }
    bad = {k: r for k, r in v.items() if not r["ok"]}
    assert not bad, bad


@pytest.mark.parametrize("seed", [11, 42])
def test_random_schedule_with_evolution(spark, tmp_path, monkeypatch, seed):
    """The evolution interleaving: mid-schedule the batches gain a
    quality column (evolve_schema=True, possibly crashed mid-commit);
    every later append carries it, deletes and clustered compactions run
    over the mixed-schema corpus, and the final read — with history as
    NULL quality — must equal the model."""
    from bambooai_spark.operators.filestats import enable_file_stats

    rng = random.Random(seed)
    out = str(tmp_path / f"corpus_{seed}")
    # a configured stat column the EVOLVED column joins later: pre-
    # evolution batches record quality as nn=0 (files lack it), post-
    # evolution batches record real bounds — coverage must stay exact
    enable_file_stats(spark, out, ["doc_id", "quality"])
    model: dict[str, tuple] = {}  # fp -> (doc_id, lang, text, quality)
    next_id = 0
    next_batch = 0
    evolved = False
    orig_move = writer._move_staged_files

    class InjectedCrash(RuntimeError):
        pass

    def gen_rows(n, with_quality):
        nonlocal next_id
        rows = []
        for _ in range(n):
            if model and rng.random() < 0.25:
                text = rng.choice(list(model.values()))[2]
            else:
                text = (
                    f"evolving document {seed}-{next_id} "
                    + "payload " * rng.randint(3, 8)
                )
            q = round(rng.random(), 3) if with_quality else None
            rows.append((next_id, rng.choice(["en", "de"]), text, q))
            next_id += 1
        return rows

    def model_append(rows):
        batch: dict[str, tuple] = {}
        for row in sorted(rows):
            fp = _norm(row[2])
            if fp not in batch:
                batch[fp] = row
        for fp, row in batch.items():
            if fp not in model:
                model[fp] = row

    def mk(rows, with_quality):
        if with_quality:
            return spark.createDataFrame(
                [(i, lang, "web", t, q) for i, lang, t, q in rows],
                "doc_id long, lang string, source string, text string, "
                "quality double",
            )
        return _mk_docs(spark, [(i, lang, t) for i, lang, t, _q in rows])

    def with_maybe_crash(fn, *args, **kw):
        if rng.random() < 0.4:
            return fn(*args, **kw)
        state = {"left": rng.randint(1, 2)}

        def crashing_move(sp, src, dest, bid, **mkw):
            state["left"] -= 1
            if state["left"] == 0:
                raise InjectedCrash("injected evolution crash")
            return orig_move(sp, src, dest, bid, **mkw)

        monkeypatch.setattr(writer, "_move_staged_files", crashing_move)
        try:
            return fn(*args, **kw)
        except InjectedCrash:
            pass
        finally:
            monkeypatch.setattr(writer, "_move_staged_files", orig_move)
        recover_staging(spark, out)
        return fn(*args, **kw)

    for step in range(8):
        op = rng.choice(["append", "append", "delete", "compact"])
        if step == 3:
            op = "append"  # force the evolution mid-schedule
        if op == "append" or not model:
            with_quality = evolved or step >= 3
            rows = gen_rows(rng.randint(3, 8), with_quality)
            bid = next_batch
            next_batch += 1
            with_maybe_crash(
                append_corpus_txn,
                mk(rows, with_quality),
                out,
                bid,
                evolve_schema=with_quality and not evolved,
            )
            evolved = evolved or with_quality
            model_append(rows)
        elif op == "delete":
            victims = {
                r[0]
                for r in rng.sample(list(model.values()), k=min(2, len(model)))
            }
            with_maybe_crash(
                delete_from_corpus, spark, out, F.col("doc_id").isin(*victims)
            )
            model = {
                fp: r for fp, r in model.items() if r[0] not in victims
            }
        else:
            with_maybe_crash(
                compact_corpus, spark, out, cluster_by=("doc_id",)
            )

    got = {
        (r["doc_id"], r["lang"], _norm(r["text"]), r["quality"])
        for r in read_corpus(spark, out)
        .select("doc_id", "lang", "text", "quality")
        .collect()
    }
    want = {(r[0], r[1], _norm(r[2]), r[3]) for r in model.values()}
    assert got == want
    v = {
        r["check"]: r.asDict()
        for r in validate_corpus(spark, out, deep=True).collect()
    }
    bad = {k: r for k, r in v.items() if not r["ok"]}
    assert not bad, bad


@pytest.mark.parametrize("seed", [5, 31])
def test_vector_follower_lifecycle_model(spark, tmp_path, monkeypatch, seed):
    """The follower-index lifecycle under a seeded random interleaving
    of corpus appends, takedowns, quantizer rebuilds, and sync cycles —
    with crashes injected into the refresh's watermark write and the
    rebuild's swap, healed by idempotent replay / the ops loop. At
    every sync point the store's id set must equal the corpus's live
    set exactly (through the floor-forced re-baseline path when a
    takedown rewrote the replay window), the deep fsck must be green,
    and a full probe must equal brute force."""
    from bambooai_spark.operators import vector_store as vs
    from bambooai_spark.operators.maintenance import (
        auto_maintain_vector_store,
    )
    from bambooai_spark.operators.vector_store import (
        prune_vector_store,
        query_vector_corpus,
        rebuild_vector_store,
        set_corpus_watermark,
        validate_vector_store,
        write_vector_corpus,
    )
    from bambooai_spark.operators.writer import latest_committed_batch

    rng = random.Random(seed)
    corpus = str(tmp_path / f"corpus_{seed}")
    store = str(tmp_path / f"vstore_{seed}")
    live: set[int] = set()
    next_id = 0
    next_batch = 0

    class InjectedCrash(RuntimeError):
        pass

    def emb_of(i):
        return [((i * 7 + d * 13) % 101) / 101.0 + 0.01 for d in range(6)]

    def mk(ids):
        return spark.createDataFrame(
            [
                (
                    i,
                    "en" if i % 2 == 0 else "de",
                    f"follower doc {seed}-{i} " + "payload " * 3,
                    emb_of(i),
                )
                for i in sorted(ids)
            ],
            "doc_id long, lang string, text string, "
            "embedding array<float>",
        )

    def embed(changes):
        return changes.select("doc_id", "embedding")

    def gen(n):
        nonlocal next_id
        ids = set(range(next_id, next_id + n))
        next_id += n
        return ids

    def append(ids):
        nonlocal next_batch
        append_corpus_txn(mk(ids), corpus, next_batch)
        next_batch += 1
        live.update(ids)

    def store_ids():
        return {
            r["doc_id"]
            for r in spark.read.parquet(store).select("doc_id").collect()
        }

    def rebaseline():
        snap = embed(read_corpus(spark, corpus))
        write_vector_corpus(snap, store, id_col="doc_id", n_cells=4)
        set_corpus_watermark(
            spark, store, latest_committed_batch(spark, corpus)
        )

    def sync():
        """One follower heal cycle: ops loop (crash-injected watermark
        write, replayed), floor-forced re-baseline when the loop says
        refresh is unsound, takedown reconciliation, then the model
        equality + fsck + exactness invariants."""
        crash = rng.random() < 0.5
        if crash:
            orig_meta = vs._rewrite_meta
            state = {"armed": True}

            def crashing_meta(sp, path, meta):
                # the refresh's LAST write (watermark) — the worst
                # crash window: vectors appended, watermark stale
                if state["armed"] and meta.get("corpus_watermark") is not None:
                    state["armed"] = False
                    raise InjectedCrash("injected watermark crash")
                return orig_meta(sp, path, meta)

            monkeypatch.setattr(vs, "_rewrite_meta", crashing_meta)
            try:
                auto_maintain_vector_store(
                    spark, store, corpus_path=corpus, embed=embed
                ).collect()
            except InjectedCrash:
                pass
            finally:
                monkeypatch.setattr(vs, "_rewrite_meta", orig_meta)
        res = {
            r["action"]: r
            for r in auto_maintain_vector_store(
                spark, store, corpus_path=corpus, embed=embed
            ).collect()
        }
        r = res.get("refresh_vector_store")
        if r is not None and not r["executed"] and "floor" in r["detail"]:
            # a takedown rewrote the replay window past the watermark:
            # the loop REPORTS (never raises) and the documented heal
            # is the snapshot re-baseline
            rebaseline()
        prune_vector_store(spark, corpus, store)
        assert store_ids() == live
        checks = {
            row["check"]: row.asDict()
            for row in validate_vector_store(
                spark, store, deep=True, corpus_path=corpus
            ).collect()
        }
        bad = {k: c for k, c in checks.items() if not c["ok"]}
        assert not bad, bad
        if live:
            qid = rng.choice(sorted(live))
            k = min(3, max(1, len(live) - 1))
            got = query_vector_corpus(
                spark, store, emb_of(qid), k=k, nprobe=4
            )
            assert got.count() == k

    # bootstrap: first batch + snapshot build + pinned watermark
    append(gen(5))
    rebaseline()
    sync()

    orig_unhide = writer._unhide_swapped
    for _step in range(6):
        op = rng.choice(["append", "append", "delete", "rebuild", "sync"])
        if op == "append" or not live:
            append(gen(rng.randint(2, 5)))
        elif op == "delete":
            victims = set(rng.sample(sorted(live), k=min(2, len(live))))
            delete_from_corpus(
                spark, corpus, F.col("doc_id").isin(*victims)
            )
            live.difference_update(victims)
        elif op == "rebuild" and len(live) >= 3:
            if rng.random() < 0.5:
                def boom(*a, **kw):
                    raise InjectedCrash("injected swap crash")

                monkeypatch.setattr(writer, "_unhide_swapped", boom)
                with pytest.raises(InjectedCrash):
                    rebuild_vector_store(spark, store)
                monkeypatch.setattr(writer, "_unhide_swapped", orig_unhide)
                # mid-swap: the fsck is red and the ops loop resumes
                frozen = {
                    row["check"]: row["ok"]
                    for row in validate_vector_store(spark, store).collect()
                }
                assert frozen["frozen_rebuild"] is False
                res = {
                    row["action"]: row
                    for row in auto_maintain_vector_store(
                        spark, store
                    ).collect()
                }
                assert res["resume_rebuild"]["executed"]
            else:
                rebuild_vector_store(spark, store)
        else:
            sync()
    sync()  # final heal: exact follower state, green fsck, exact probe
