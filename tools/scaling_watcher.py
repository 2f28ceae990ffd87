"""Clean-window scaling watcher: fire single ``bench.py --scaling``
pairs only when the host looks quiet, so the clean-median efficiency
population grows without hand-babysitting.

This VM's memory-pressure phases swing first-touch page-fault cost
~50× for 25+ minutes at a time (BASELINE.md noise appendix), which
fakes scaling efficiencies in BOTH directions.  The watcher:

* probes twice (fresh subprocesses, 256 MB first-touch — the same
  probe ``bench.py --scaling`` embeds) ``probe_gap_s`` apart and
  requires BOTH under ``clean_ms``;
* requires 1-minute loadavg under ``max_load`` so it never fires while
  a dev test run owns the box;
* alternates configs (default ``8,32`` then ``2,8``) and appends every
  result — clean or not, bench re-probes inside the timed protocol —
  to a JSONL for later aggregation;
* holds a lock file while a pair is in flight so interactive work can
  check-and-wait instead of polluting the legs.

Usage::

    python tools/scaling_watcher.py --hours 4 --pairs-per-config 4 \
        --convs 72000 --out /tmp/fmr_scaling_watch.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOCK = "/tmp/fmr_scaling_watch.lock"

_PROBE_SNIPPET = (
    "import sys; sys.path.insert(0, %r); "
    "from bench import _host_probe_ms; print(_host_probe_ms())" % REPO
)


def fresh_probe_ms() -> float:
    out = subprocess.run(
        [sys.executable, "-c", _PROBE_SNIPPET], capture_output=True, text=True, check=True
    ).stdout
    return float(out.strip())


def load1() -> float:
    return os.getloadavg()[0]


def run_pair(cpus: str, convs: int) -> dict:
    env = dict(
        os.environ,
        FMR_SCALING_CONVS=str(convs),
        FMR_SCALING_PAIRS="1",
        FMR_SCALING_CPUS=cpus,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--scaling"],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=float, default=4.0)
    ap.add_argument("--pairs-per-config", type=int, default=4)
    ap.add_argument("--convs", type=int, default=72000)
    ap.add_argument("--configs", default="8,32;2,8")
    ap.add_argument("--clean-ms", type=float, default=400.0)
    ap.add_argument("--max-load", type=float, default=4.0)
    ap.add_argument("--probe-gap-s", type=float, default=20.0)
    ap.add_argument("--cycle-s", type=float, default=90.0)
    ap.add_argument("--out", default="/tmp/fmr_scaling_watch.jsonl")
    args = ap.parse_args()

    configs = args.configs.split(";")
    fired = {c: 0 for c in configs}
    deadline = time.time() + args.hours * 3600
    turn = 0
    while time.time() < deadline and any(
        fired[c] < args.pairs_per_config for c in configs
    ):
        cfg = configs[turn % len(configs)]
        if fired[cfg] >= args.pairs_per_config:
            turn += 1
            continue
        ld = load1()
        if ld > args.max_load:
            time.sleep(args.cycle_s)
            continue
        p1 = fresh_probe_ms()
        if p1 > args.clean_ms:
            print(f"[watch] dirty probe {p1:.0f} ms (load {ld:.1f}); sleeping", flush=True)
            time.sleep(args.cycle_s)
            continue
        time.sleep(args.probe_gap_s)
        p2 = fresh_probe_ms()
        if p2 > args.clean_ms:
            print(f"[watch] second probe dirty {p2:.0f} ms; sleeping", flush=True)
            time.sleep(args.cycle_s)
            continue
        print(f"[watch] clean window (probes {p1:.0f}/{p2:.0f} ms) — firing {cfg}", flush=True)
        open(LOCK, "w").write(str(os.getpid()))
        try:
            res = run_pair(cfg, args.convs)
        except subprocess.CalledProcessError as exc:
            res = {"error": exc.stderr[-2000:] if exc.stderr else "unknown"}
        finally:
            os.unlink(LOCK)
        rec = {
            "ts": time.time(),
            "config": cfg,
            "pre_probes_ms": [p1, p2],
            "result": res,
        }
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        eff = res.get("scaling_efficiency")
        clean = res.get("n_clean_pairs")
        print(f"[watch] {cfg}: eff={eff} clean_pairs={clean}", flush=True)
        fired[cfg] += 1
        turn += 1
        time.sleep(60)
    print(f"[watch] done: {fired}", flush=True)


if __name__ == "__main__":
    main()
