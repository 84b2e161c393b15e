"""Round-closing verification battery — one command, every gate.

Runs, in order, each in its own subprocess (fresh JVM, no session
accretion), continuing past failures and summarizing at the end:

1. bench.py FIRST (writes BENCH_DETAIL.json / BENCH_HISTORY.jsonl) —
   quiet-first protocol, enforced by ORDER: the wall-time record is
   taken before the battery itself loads the machine for an hour
   (the round-11 driver snapshot landed 33% hot because the bench ran
   last).  The 1-minute loadavg is sampled immediately before the run
   and recorded in the summary; >25% of the cores busy flags the
   record as load-contaminated (summary field, non-fatal — the
   operator decides whether to rerun);
2. stream_bench.py (streaming ingest throughput, verified) — also a
   wall-time record, so it stays ahead of the correctness grind;
3. full strict oracle gate at sf0.01 (the driver's correctness gate);
4. full registry sweep at sf0.1 (10x the gate — catches scale cliffs,
   skip with --skip-sweep);
5. the chaos suite (pytest -m chaos): the randomized/multiprocess
   walks default-deselected by pytest.ini to hold the quiet-suite
   wall-time line — run here EVERY round; pytest's exit-5 on an empty
   marker selection turns marker drift into a red step;
6. sf1_profile.py (the 10x-scale wall-time ratios) — appended to
   SF1_HISTORY.jsonl with a ratio-vs-last-round comparison so scale
   regressions are caught PER ROUND, not rediscovered later: any
   query whose sf1/sf0.1 ratio degrades >25% against the previous
   battery is flagged in the summary.  Ratios are load-robust (both
   sides of a ratio see the same machine), so running late is fine.

Usage: python tools/close_battery.py [--skip-sweep] [--skip-bench]
       [--round N]   (--skip-bench resumes past an already-recorded bench)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1_HISTORY = os.path.join(REPO, "SF1_HISTORY.jsonl")


def _run(label: str, cmd: list[str], timeout: int) -> tuple[bool, str]:
    t0 = time.time()
    try:
        proc = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True, timeout=timeout
        )
        ok, out = proc.returncode == 0, proc.stdout
        tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-3:])
    except subprocess.TimeoutExpired:
        ok, out, tail = False, "", f"TIMEOUT after {timeout}s"
    print(f"[battery] {label}: {'OK' if ok else 'FAIL'} "
          f"({time.time() - t0:.0f}s)\n  {tail}", file=sys.stderr)
    return ok, out


def main() -> int:
    skip_sweep = "--skip-sweep" in sys.argv
    # --skip-bench: resume a battery whose quiet-first bench already
    # completed and was recorded (e.g. the runner died mid-battery) —
    # the record stands, re-running it on a now-warm machine would
    # only overwrite a quiet number with a hot one
    skip_bench = "--skip-bench" in sys.argv
    round_tag = None
    if "--round" in sys.argv:
        idx = sys.argv.index("--round") + 1
        if idx >= len(sys.argv):
            print("usage: close_battery.py [--skip-sweep] "
                  "[--skip-bench] [--round N]", file=sys.stderr)
            return 2
        round_tag = int(sys.argv[idx])
    py = sys.executable
    results = {}

    # QUIET-FIRST: the bench is the official wall-time record — it
    # runs before anything else heats the machine, and the pre-run
    # loadavg is recorded so a co-tenant-contaminated number is
    # labeled as such instead of entering history as a regression.
    # On --skip-bench resume the record was taken by the PRIOR
    # invocation under its own conditions — sampling loadavg now
    # would attach resume-time provenance to a record it never
    # measured, so both fields are reported as skipped instead.
    load1 = bench_quiet = None
    if skip_bench:
        results["bench"] = True
        print("[battery] bench: SKIPPED (--skip-bench: prior quiet "
              "record stands)", file=sys.stderr)
    else:
        load1 = round(os.getloadavg()[0], 2)
        ncpu = os.cpu_count() or 1
        bench_quiet = load1 <= 0.25 * ncpu
        if not bench_quiet:
            print(f"[battery] WARNING: loadavg {load1:.1f} on {ncpu} "
                  "cpus at bench start — record will be flagged "
                  "load-contaminated", file=sys.stderr)
        results["bench"], _ = _run("bench", [py, "bench.py"], 3600)
    results["stream_bench"], _ = _run(
        "stream bench", [py, "tools/stream_bench.py"], 1800
    )
    results["gate_sf0.01"], _ = _run(
        "oracle gate sf0.01",
        [py, "tools/check_oracle.py", "/root/testdata/sf0.01"],
        3600,
    )
    if not skip_sweep:
        results["sweep_sf0.1"], _ = _run(
            "registry sweep sf0.1",
            [py, "tools/check_oracle.py", "/root/testdata/sf0.1"],
            5400,
        )
    # the chaos walks (randomized stream/index walks, multiprocess
    # SIGKILL staging) are default-deselected via pytest.ini to hold
    # the quiet-suite wall-time line — the battery ALWAYS runs them;
    # pytest exits 5 when the marker selects nothing, so marker drift
    # reads as a red step, never as silent coverage loss
    results["chaos_suite"], _ = _run(
        "chaos suite (-m chaos)",
        [py, "-m", "pytest", "tests/", "-m", "chaos", "-q"],
        1800,
    )

    ok, out = _run("sf1 profile", [py, "tools/sf1_profile.py"], 3600)
    results["sf1_profile"] = ok
    degraded = []
    if ok:
        line = next(
            (ln for ln in out.splitlines() if ln.startswith("{")), None
        )
        if line is None:
            # exit 0 with no parseable result line means the
            # degradation check DID NOT RUN — that must read as red,
            # not as silently green
            results["sf1_profile"] = False
            print("[battery] sf1 profile: no JSON line in output — "
                  "degradation check skipped", file=sys.stderr)
        else:
            entry = json.loads(line)
            prev = None
            if os.path.exists(SF1_HISTORY):
                with open(SF1_HISTORY) as f:
                    lines = [ln for ln in f if ln.strip()]
                if lines:
                    prev = json.loads(lines[-1])
            for q, cur in entry["queries"].items():
                p = (prev or {}).get("queries", {}).get(q)
                if p and p.get("ratio") and cur.get("ratio"):
                    if cur["ratio"] > p["ratio"] * 1.25:
                        degraded.append(
                            f"{q}: ratio {p['ratio']} -> {cur['ratio']}"
                        )
            entry["round"] = round_tag
            with open(SF1_HISTORY, "a") as f:
                f.write(json.dumps(entry) + "\n")

    all_green = all(results.values()) and not degraded
    print(json.dumps({
        "steps": results,
        "bench_loadavg_at_start": load1,
        "bench_quiet": bench_quiet,
        "sf1_ratio_degradations": degraded,
        "all_green": all_green,
    }))
    # a >25% scale-ratio degradation fails the battery — catching it
    # per round is the tool's reason to exist; a named-cause exception
    # is the operator's call to make AFTER seeing a red exit
    return 0 if all_green else 1


if __name__ == "__main__":
    sys.exit(main())
