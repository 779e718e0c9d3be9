"""Scale audit: time EVERY registered query at a benchdata dir.

Usage: python tools/scale_audit.py [sf_dir] [threshold_sec] [name...]
       with optional flags anywhere:
         --recycle=N        recycle the SparkSession every N queries
                            (default 25; 0 disables). A single uniform
                            protocol — no per-query fresh-run
                            substitutions: long sweeps accumulate JVM
                            heap/GC pressure that can fail queries
                            innocent in isolation (r7: pagerank_sources,
                            exact_substring_dups at sf100).
         --baseline=PATH    a prior audit JSON (e.g. AUDIT_r07.json at
                            sf10) to divide against: emits per-query
                            time ratios and auto-flags any query whose
                            ratio exceeds --ratio-flag — the ntile-class
                            outlier detector.
         --ratio-flag=X     ratio threshold for the flag list. Default is
                            SCALE-AWARE: 15 for a cross-scale baseline
                            (sf10→sf100 growth expected), 3 when the
                            baseline's sf_dir matches (same-scale round-
                            over-round — VERDICT r9: the flat 15 passed
                            2.3–3.8x same-scale slowdowns silently).

         --disk-recycle-mb=N  recycle the session BEFORE any query whose
                            pre-query free spill-dir space is below N MB
                            (0 = off). Sheds accumulated shuffle files —
                            the r10 sf100 sweep lost 3 queries to
                            spill-dir exhaustion with this off.
         --preflight-free-mb=N  refuse to START unless the spill dir has
                            N MB free (default: 3x the sf_dir corpus
                            bytes — the worst measured single-query spill
                            is ~2.5x; 0 disables). Fails a doomed sweep
                            in seconds instead of after 6,400 s.

Trailing name args restrict the sweep to those queries (targeted
re-audit after changing a subset).

The headline bench (bench.py) tracks the flagship queries; this sweep
times the whole registry (noop sink, one run each, clearCache between)
and prints one JSON line with per-query seconds sorted slowest-first,
flagging everything above the threshold (default 15 s). This is the
per-round regression net that caught repetition_scores at 51 s and
local_supplier_volume_q5 at 14 s — run it at sf10 after adding queries.

Streaming-drain queries rebuild their source each call, so their numbers
include that setup; they are still comparable round-over-round.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Per-query watchdog (seconds). Purpose: a long-lived sweep session reuses
# forked pyspark daemon workers across queries, and a worker that dies in a
# bad state can leave a later task's JVM reader blocked FOREVER on its
# socket (observed r7: exact_substring_dups wedged 30+ min mid-sweep at
# stage N 33/34 with the box idle — task thread parked in
# BasePythonRunner.ReaderInputStream.read, no live python worker, zero CPU;
# the same query fresh-session runs in 105 s at sf100). The watchdog
# cancels the wedged jobs and the main loop's dead-context recovery then
# rebuilds the session (killing the poisoned daemon pool).
WATCHDOG_SEC = float(os.environ.get("SPARK_GRAFT_AUDIT_WATCHDOG_SEC", "1500"))


class WatchdogTimeout(RuntimeError):
    pass


def _run_with_watchdog(
    spark,
    fn,
    sf_dir: str,
    timeout_s: float,
    lint: dict | None = None,
    job_group: str | None = None,
) -> None:
    """Build + noop-save one query in a worker thread; on timeout cancel
    all jobs, stop the (suspect) session so the caller's recovery path
    rebuilds it, and raise WatchdogTimeout. The timed-out worker thread
    itself cannot be killed from Python — it leaks (daemonized, dies
    with the process); if its blocked read later unblocks, any exception
    it raised is logged to stderr rather than silently dropped.

    ``lint`` (optional dict with "window"/"broadcast" lists) collects
    plan-lint violations found in the built plan AT THIS sf_dir —
    size-gated queries pick different physical branches at audit scales
    than at the pytest lint's sf0.01, so the audit re-checks the branch
    that actually runs here (window lint: empty-partition-spec windows;
    broadcast lint: hints over unaggregated corpus scans — gated hints
    must have DECLINED themselves at audit scale).

    ``job_group`` tags the run's jobs so the caller can read per-query
    failed-task counts afterwards. Set INSIDE the worker thread: PySpark
    pins each Python thread to its own JVM thread, so a group set on the
    calling thread would not tag the worker's jobs."""
    import threading

    err: list[BaseException] = []
    done = threading.Event()

    def work():
        try:
            if job_group:
                spark.sparkContext.setJobGroup(job_group, "scale audit")
            df = fn(spark, sf_dir)
            if lint is not None:
                try:
                    from traderjoe_etl_spark.plans.audit import (
                        forced_broadcast_violations,
                        global_window_violations,
                        hinted_aggregate_warnings,
                    )

                    lint["window"].extend(global_window_violations(df))
                    lint["broadcast"].extend(forced_broadcast_violations(df))
                    lint.setdefault("agg_warn", []).extend(hinted_aggregate_warnings(df))
                except Exception:
                    pass  # lint must never fail the timing run
            df.write.format("noop").mode("overwrite").save()
        except BaseException as e:  # surfaced by the caller
            err.append(e)
            if done.is_set():  # post-timeout: caller already moved on
                print(
                    f"    [watchdog] leaked worker thread later raised: "
                    f"{type(e).__name__}: {str(e)[:200]}",
                    file=sys.stderr,
                    flush=True,
                )
        finally:
            # Under pinned-thread mode (PYSPARK_PIN_THREAD, default since
            # Spark 3.2) the group is scoped to this worker's JVM thread; a
            # LEAKED timed-out worker whose blocked read later unblocks
            # must not run tagged with a long-dead query's group — and
            # under legacy NON-pinned mode local properties are shared
            # across Python threads, where a stale group would cross-
            # attribute later queries' failed_tasks counts (ADVICE r9).
            if job_group:
                try:
                    spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
                    spark.sparkContext.setLocalProperty("spark.job.description", None)
                except Exception:
                    pass

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        done.set()
        racing = ""
        if err:  # a racing real failure beat the timeout — don't hide it
            racing = f"; racing failure: {type(err[0]).__name__}: {str(err[0])[:150]}"
            print(f"    [watchdog] racing failure at timeout: {racing}",
                  file=sys.stderr, flush=True)
        try:
            spark.sparkContext.cancelAllJobs()
        except Exception:
            pass
        try:
            spark.stop()  # kill the poisoned daemon pool; caller rebuilds
        except Exception:
            pass
        raise WatchdogTimeout(
            f"query exceeded {timeout_s:.0f}s watchdog; session stopped "
            f"(worker thread leaked until process exit){racing}"
        )
    if err:
        raise err[0]


def _failed_tasks_for_group(spark, job_group: str) -> int:
    """Failed-task count across every job the group ran — the
    pass-on-retry detector (VERDICT r8 item 2): under local[N,4] a task
    that needed attempt 2+ is invisible in wall time alone; this surfaces
    it in the artifact so the gate becomes "0 or explained". Reads the
    PUBLIC status tracker (stage infos retain cumulative numFailedTasks
    per stage); stages evicted from the store (retainedStages overflow)
    are skipped — within one query's group that doesn't happen."""
    try:
        st = spark.sparkContext.statusTracker()
        seen: set[int] = set()
        total = 0
        for jid in st.getJobIdsForGroup(job_group) or []:
            jinfo = st.getJobInfo(jid)
            if jinfo is None:
                continue
            for sid in jinfo.stageIds:
                if sid in seen:
                    continue
                seen.add(sid)
                sinfo = st.getStageInfo(sid)
                if sinfo is not None:
                    total += sinfo.numFailedTasks
        return total
    except Exception:
        return -1  # tracker unavailable (dead context) — marked, not hidden


def _fresh_session(spark=None):
    """Stop the given session (if any) and build a new one, recovering
    even when the JVM process itself died (gateway reset)."""
    from traderjoe_etl_spark.session import get_spark

    if spark is not None:
        # getOrCreate alone would hand back the SAME dead session: a
        # JVM-side stop doesn't clear PySpark's _instantiatedSession
        # singletons — only a Python-side stop() does.
        try:
            spark.stop()
        except Exception:
            pass
    try:
        spark = get_spark("scale-audit")
    except Exception:
        # the JVM PROCESS died (heap OOM kills local-mode outright): the
        # py4j gateway is gone and getOrCreate just ECONNREFUSEDs against
        # it. Reset the process-level gateway singletons so a brand-new
        # JVM launches.
        print("    gateway dead — launching a fresh JVM", file=sys.stderr, flush=True)
        from pyspark import SparkContext
        from pyspark.sql import SparkSession

        try:
            if SparkContext._gateway is not None:
                SparkContext._gateway.shutdown()
        except Exception:
            pass
        SparkContext._gateway = None
        SparkContext._jvm = None
        with SparkContext._lock:
            SparkContext._active_spark_context = None
        SparkSession._instantiatedSession = None
        SparkSession._activeSession = None
        os.environ.pop("PYSPARK_GATEWAY_PORT", None)
        os.environ.pop("PYSPARK_GATEWAY_SECRET", None)
        spark = get_spark("scale-audit")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _spill_dir(spark) -> str:
    """Directory Spark actually spills shuffle/broadcast blocks to — the
    filesystem the disk-headroom forensics, the --disk-recycle-mb floor,
    and the preflight must measure (ADVICE r10: a hardcoded /tmp reads the
    wrong filesystem when spark.local.dir / SPARK_LOCAL_DIRS points
    elsewhere, silently defeating the r10 disk-exhaustion mitigation).
    Resolution mirrors Spark's Utils.getConfiguredLocalDirs precedence in
    local mode: SPARK_LOCAL_DIRS env > spark.local.dir conf > /tmp
    (java.io.tmpdir). Multi-dir values take the FIRST entry — one statvfs;
    on a multi-disk layout the floor is approximate, and the measured path
    is recorded in the protocol block so a consumer can tell."""
    env = os.environ.get("SPARK_LOCAL_DIRS", "").split(",")[0].strip()
    if env:
        return env
    try:
        conf = spark.sparkContext.getConf().get("spark.local.dir", "/tmp")
        return (conf or "/tmp").split(",")[0].strip() or "/tmp"
    except Exception:
        return "/tmp"


def _dir_bytes(sf_dir: str) -> int:
    """Total on-disk bytes under sf_dir (the corpus the sweep reads)."""
    total = 0
    for root, _, files in os.walk(sf_dir):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _free_mb(path: str) -> int:
    st = os.statvfs(path)
    return int(st.f_bavail * st.f_frsize / 1e6)


def _task_attempts(spark) -> int:
    """Task-attempt count from the LIVE session's master string (ADVICE
    r8: re-reading the env at report time misrecords when get_spark was
    called with an explicit master or the env changed mid-run, and a
    malformed env value raised uncaught). local[N,M] → M; bare local[N]
    or bracket-less 'local' → 1 (local-mode fail-fast default);
    non-local (incl. local-cluster) → spark.task.maxFailures (cluster
    default 4)."""
    try:
        master = spark.sparkContext.master
        if master == "local":
            return 1  # bracket-less local mode also pins maxFailures=1
        if master.startswith("local["):
            inner = master[len("local[") : master.index("]")]
            parts = [p.strip() for p in inner.split(",")]
            return int(parts[1]) if len(parts) > 1 else 1
        return int(spark.conf.get("spark.task.maxFailures", "4"))
    except Exception:
        return -1  # unknown — recorded, not guessed


def main() -> None:
    # strict flag parsing: --name=value only. A typo'd/unknown flag or a
    # space-separated value ("--recycle 10" puts 10 into the positionals
    # as a bogus threshold) silently misconfigures a multi-hour sweep —
    # fail fast instead.
    KNOWN = {
        "--recycle",
        "--baseline",
        "--ratio-flag",
        "--disk-recycle-mb",
        "--preflight-free-mb",
    }
    flag_vals: dict[str, str] = {}
    pos: list[str] = []
    for a in sys.argv[1:]:
        if a.startswith("--"):
            name, eq, val = a.partition("=")
            if name not in KNOWN or not eq:
                sys.exit(
                    f"unknown or valueless flag {a!r} — flags are "
                    f"{sorted(KNOWN)} and take --name=value"
                )
            if name in flag_vals:
                sys.exit(f"duplicate flag {name}")
            flag_vals[name] = val
        else:
            pos.append(a)

    sf_dir = pos[0] if len(pos) > 0 else "benchdata/sf10"
    threshold = float(pos[1]) if len(pos) > 1 else 15.0
    only = set(pos[2:])
    recycle_every = int(flag_vals.get("--recycle", "25"))
    # Early-recycle floor for FREE /tmp megabytes (0 = off, the r10-and-
    # earlier protocol): a session accumulates every prior query's shuffle
    # files until context stop, and the r10 sf100 sweep lost three queries
    # to /tmp exhaustion (~53 GB effective headroom vs a single query's
    # ~40 GB spill). With a floor set, the session recycles BEFORE a query
    # whenever headroom is below it — shedding accumulated spill instead of
    # dying mid-write. Changes timing comparability (extra recycles), so it
    # is recorded in the protocol block.
    disk_recycle_mb = int(flag_vals.get("--disk-recycle-mb", "0"))
    baseline_path = flag_vals.get("--baseline", "")

    baseline_times: dict[str, float] = {}
    baseline_meta: dict[str, object] = {}
    if baseline_path:
        with open(baseline_path) as f:
            bl = json.load(f)
        baseline_times = bl.get("times", {})
        baseline_meta = {"sf_dir": bl.get("sf_dir"), "protocol": bl.get("protocol")}

    # Ratio-flag default is SCALE-AWARE (VERDICT r9: the fixed 15 was right
    # for sf10→sf100 denominators but passed 2.3–3.8× SAME-SCALE round-over-
    # round slowdowns silently): a baseline at the same sf_dir compares
    # like-for-like, where anything ≥3× deserves a fresh-vs-fresh pair.
    # abspath both sides: an absolute-vs-relative spelling of the SAME dir
    # must not silently fall back to the loose cross-scale threshold
    same_scale = bool(baseline_meta) and os.path.abspath(
        str(baseline_meta.get("sf_dir"))
    ) == os.path.abspath(sf_dir)
    ratio_flag = float(flag_vals.get("--ratio-flag", "3" if same_scale else "15"))

    from traderjoe_etl_spark.queries import queries

    spark = _fresh_session()

    # Preflight free-disk floor (VERDICT r10 item 3): the r10 sf100 sweep
    # burned 6,400 s before three queries died to spill-disk exhaustion —
    # a box without the headroom must fail LOUDLY before the sweep starts,
    # like the r6 stale-blockmgr rule. The required floor FOLLOWS THE DATA
    # (same philosophy as corpus_width): the worst measured single-query
    # spill is ~2.5x the corpus's on-disk bytes (sparse_shingle ~40 GB on
    # the 16 GB sf100 dir), so default to 3x dir bytes. Override with
    # --preflight-free-mb=N (0 disables — recorded in the protocol block).
    spill_dir = _spill_dir(spark)
    preflight_mb = int(
        flag_vals.get("--preflight-free-mb", str(int(3 * _dir_bytes(sf_dir) / 1e6)))
    )
    try:
        start_free_mb = _free_mb(spill_dir)
    except OSError as exc:
        sys.exit(f"preflight: cannot statvfs spill dir {spill_dir!r}: {exc}")
    if preflight_mb and start_free_mb < preflight_mb:
        sys.exit(
            f"preflight: {start_free_mb} MB free on spill dir {spill_dir!r} "
            f"< required {preflight_mb} MB (3x the {sf_dir} corpus unless "
            f"--preflight-free-mb overrides) — the r10 sf100 sweep lost 3 "
            f"queries to spill-disk exhaustion; refusing to start. Free "
            f"space or pass --preflight-free-mb=0 to accept the risk."
        )
    if disk_recycle_mb and start_free_mb <= disk_recycle_mb:
        sys.exit(
            f"preflight: --disk-recycle-mb={disk_recycle_mb} is at/above the "
            f"spill dir's current free space ({start_free_mb} MB on "
            f"{spill_dir!r}) — a fresh session can never rise above the "
            f"floor, so the sweep would recycle before every query."
        )

    qs = queries()
    if only:
        unknown = only - set(qs)
        if unknown:  # a typo'd name must not read as a clean (empty) sweep
            sys.exit(f"unknown query name(s): {sorted(unknown)}")
        qs = {k: v for k, v in qs.items() if k in only}

    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    lint_hits: dict[str, list[str]] = {}
    bcast_hits: dict[str, list[str]] = {}
    bcast_wl_hits: dict[str, list[str]] = {}
    agg_warns: dict[str, list[str]] = {}
    failed_tasks: dict[str, int] = {}
    whitelists_loaded = True
    try:  # same justified whitelists as the pytest lints
        from tests.test_plan_shapes import _FORCED_BROADCAST_WHITELIST as _bwl
        from tests.test_plan_shapes import _GLOBAL_WINDOW_WHITELIST as _wl
    except Exception as exc:
        # Empty-set fallback would misfile GATED hits into
        # broadcast_hint_lint — the "ungated pin shipped" failure signal —
        # so the degradation must be loud and artifact-visible (ADVICE r9):
        # a non-empty broadcast_hint_lint with whitelists_loaded=false is a
        # tooling problem, not a regression.
        print(
            f"WARNING: lint whitelists unavailable ({type(exc).__name__}: "
            f"{exc}) — whitelisted hits will appear in the LINT fields",
            file=sys.stderr,
            flush=True,
        )
        whitelists_loaded = False
        _wl = set()
        _bwl = set()

    disk_floor_mb: dict[str, int] = {}  # pre-query free /tmp space (MB)
    for i, name in enumerate(sorted(qs)):
        if recycle_every and i and i % recycle_every == 0:
            # Uniform protocol point: shed accumulated heap/daemon state so
            # position in the sweep stops mattering (r7's two mid-sweep-only
            # failures were ambient-pressure artifacts, not query bugs).
            print(f"... recycling session at query {i}", file=sys.stderr, flush=True)
            spark = _fresh_session(spark)
        print(f"... {name}", file=sys.stderr, flush=True)  # hang forensics
        try:
            # Shuffle-spill headroom forensics (r10: THREE in-sweep context
            # deaths traced to spill-dir exhaustion — sparse_shingle alone
            # spills ~40 GB and a 10-query session accumulates prior queries'
            # shuffle files until context stop; the box has only ~53 GB
            # effective headroom). Record the floor so a death's disk state
            # is attributable from the artifact alone.
            free_mb = _free_mb(spill_dir)
            disk_floor_mb[name] = free_mb
            if disk_recycle_mb and free_mb < disk_recycle_mb:
                print(
                    f"... disk headroom {free_mb} MB < {disk_recycle_mb} — "
                    f"recycling session before {name}",
                    file=sys.stderr,
                    flush=True,
                )
                spark = _fresh_session(spark)
        except Exception:
            pass
        try:
            # time BUILD + execute: iterative queries do real work in
            # eager localCheckpoints during construction (BFS, pagerank) —
            # timing only the final action hides it (a lazy plan's build is
            # sub-ms, so non-iterative numbers are unchanged)
            # clearCache first: a prior query's un-released persist()
            # (e.g. minhash band entries) can silently serve an identical
            # subtree in a later query — ngram_jaccard once read 2.65s in
            # an audit because minhash's cache was still warm; its honest
            # standalone cost is candidates + verify (~28s).
            spark.catalog.clearCache()
            # Then drop THIS process's references and force a full JVM GC
            # (outside the timer): broadcast hash relations and
            # localCheckpoint blocks from prior queries are only reaped by
            # ContextCleaner once the JVM-side objects become weakly
            # reachable, which needs the Python refs gone (gc.collect) AND
            # a driver GC cycle (System.gc) — in local mode driver ==
            # executor, so un-reaped blocks squeeze the shared
            # execution-memory pool. r8's uniform-protocol sf100 sweep hit
            # exactly this: a HashAggregate 140 queries in could not
            # acquire its initial 256 KB page while the heap was full of
            # unreferenced prior-query blocks awaiting collection.
            gc.collect()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
            lint: dict[str, list[str]] = {"window": [], "broadcast": [], "agg_warn": []}
            group = f"audit:{name}"
            t0 = time.perf_counter()
            _run_with_watchdog(
                spark, qs[name], sf_dir, WATCHDOG_SEC, lint=lint, job_group=group
            )
            times[name] = round(time.perf_counter() - t0, 2)
            if lint["window"] and name not in _wl:
                lint_hits[name] = [s[:160] for s in lint["window"]]
            if lint["broadcast"]:
                # whitelisted entries are NOT suppressed — their whitelist
                # justification is a scale-DEPENDENT decline claim (the
                # gated hint must be GONE once its byte estimate crosses
                # the cap), so a hint still present at audit scale must be
                # visible in the artifact to be checked against the
                # expected decline point, not silently dropped.
                dest = bcast_wl_hits if name in _bwl else bcast_hits
                dest[name] = [s[:160] for s in lint["broadcast"]]
            if lint["agg_warn"]:
                agg_warns[name] = [s[:160] for s in lint["agg_warn"]]
            nf = _failed_tasks_for_group(spark, group)
            if nf:  # only non-clean entries (0 == clean pass, omitted)
                failed_tasks[name] = nf
            print(f"    {name} {times[name]}s", file=sys.stderr, flush=True)
        except Exception as exc:  # keep sweeping; report at the end
            errors[name] = f"{type(exc).__name__}: {str(exc)[:200]}"
            # a query that killed the SparkContext (executor OOM in local
            # mode stops the whole JVM context) must not cascade a
            # stopped-context error into every later row — rebuild
            try:
                dead = spark.sparkContext._jsc.sc().isStopped()
            except Exception:
                dead = True
            if dead:
                print(
                    f"    {name} stopped the SparkContext — rebuilding session",
                    file=sys.stderr,
                    flush=True,
                )
                spark = _fresh_session(spark)

    ordered = dict(sorted(times.items(), key=lambda kv: -kv[1]))
    out = {
        "sf_dir": sf_dir,
        "n_queries": len(times),
        "total_sec": round(sum(times.values()), 1),
        # self-describing protocol: per-query GC and the task-attempt count
        # change individual timings (up to ~4x for late-sweep queries), so
        # artifacts must record which protocol produced them before being
        # used as a --baseline denominator.
        "protocol": {
            "recycle_every": recycle_every,
            "watchdog_sec": WATCHDOG_SEC,
            "per_query_gc": True,
            "task_attempts": _task_attempts(spark),
            # False = a lint field may contain WHITELISTED hits (tooling
            # degradation, not a regression) — see the startup warning.
            "whitelists_loaded": whitelists_loaded,
            # Job-group tagging assumes each Python thread pins to its own
            # JVM thread (PYSPARK_PIN_THREAD, default on since Spark 3.2);
            # under legacy shared-properties mode failed_tasks attribution
            # is unreliable — recorded so a consumer can tell.
            "pinned_threads": os.environ.get("PYSPARK_PIN_THREAD", "true").lower()
            not in ("0", "false"),
            # 0 = off (the r10-and-earlier protocol); non-zero adds
            # disk-pressure recycles, so timings are only comparable to
            # baselines with the same value.
            "disk_recycle_mb": disk_recycle_mb,
            # the filesystem all disk floors measured (resolved from
            # SPARK_LOCAL_DIRS / spark.local.dir — ADVICE r10) + the
            # preflight gate this run passed (0 = explicitly disabled).
            "spill_dir": spill_dir,
            "preflight_free_mb": preflight_mb,
            "preflight_measured_free_mb": start_free_mb,
        },
        "over_threshold": {k: v for k, v in ordered.items() if v > threshold},
        "times": ordered,
        "errors": errors,
        # empty-partition-spec windows found in the AT-SCALE plan branch
        # (size-gated queries pick different physical plans here than at
        # the pytest lint's sf0.01) — non-empty = a scale-killer shipped
        "global_window_lint": lint_hits,
        # broadcast hints over unaggregated corpus scans in the AT-SCALE
        # plan (the q18 OOM class): gated_broadcast sites must have
        # declined themselves here — non-empty = an ungated pin shipped
        "broadcast_hint_lint": bcast_hits,
        # whitelisted (gated) hints STILL PRESENT at this sf_dir — each
        # must match its documented decline point (e.g. q5's gates decline
        # at sf100; q7's selective cohort legitimately holds to ~sf120).
        # A whitelisted query appearing here at a scale where its note
        # says "declined" is a failure-to-decline regression.
        "broadcast_hint_whitelisted": bcast_wl_hits,
        # per-query failed/retried task counts (pass-on-retry detector
        # under local[N,4]); only non-zero entries appear — gate is
        # "empty, or each entry explained in the round notes". -1 =
        # status tracker unreadable for that query (dead context).
        "failed_tasks": failed_tasks,
        # WARN-level (not a gate): broadcast-hinted join sides whose
        # bounding Aggregate groups on a near-unique corpus key — lint-clean
        # (an Aggregate is "reducing") but the aggregate itself scales with
        # the corpus (the q21 class). Entries need adjudication, typically
        # "hint is size-gated and declines before the aggregate gets big".
        "broadcast_agg_warn": agg_warns,
        # pre-query free /tmp megabytes (min over the sweep tells whether
        # shuffle spill approached disk exhaustion — the r10 failure mode);
        # only the 10 lowest readings are kept to bound artifact size.
        "disk_floor_mb": dict(sorted(disk_floor_mb.items(), key=lambda kv: kv[1])[:10]),
    }
    if baseline_times:
        ratios = {
            k: round(v / baseline_times[k], 1)
            for k, v in times.items()
            if baseline_times.get(k)
        }
        ratios = dict(sorted(ratios.items(), key=lambda kv: -kv[1]))
        out["baseline"] = baseline_path
        # Ratios are only comparable like-for-like: a baseline produced at a
        # different scale OR under a different protocol generation (recycle
        # cadence changes JIT/cache warmth — the r8→r9 recycle-25→10 move
        # read as 2.3–3.8× "slowdowns" that were protocol, not plan) must be
        # visible to whoever reads ratio_flagged.
        out["baseline_meta"] = baseline_meta
        out["baseline_same_scale"] = same_scale
        # compare only the TIMING-relevant protocol knobs — informational
        # fields (whitelists_loaded, pinned_threads) don't change timings
        blp = baseline_meta.get("protocol") or {}
        out["baseline_same_protocol"] = bool(blp) and all(
            blp.get(k) == out["protocol"][k]
            for k in ("recycle_every", "per_query_gc", "task_attempts")
        ) and blp.get("disk_recycle_mb", 0) == disk_recycle_mb
        # (missing in pre-r10 artifacts == the feature off, i.e. 0)
        out["ratio_flag_threshold"] = ratio_flag
        out["ratio_vs_baseline"] = ratios
        out["ratio_flagged"] = {k: v for k, v in ratios.items() if v > ratio_flag}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
