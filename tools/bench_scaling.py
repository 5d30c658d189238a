"""Two-parallelism scaling benchmark (north rule: N→4N efficiency ≥0.8).

Runs tools/drain_once.py in fresh subprocesses (one JVM per master
setting) at local[8] and local[32] on the identical seeded frontier,
reports throughput at both plus scaling efficiency
``eff = (T32/T8)/(32/8)``. Prints one JSON line; optionally appends a
results block to BASELINE.md with --record.
"""

from __future__ import annotations

import json
import subprocess
import sys

def _arg(name, default):
    import sys
    return int(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default


N_SMALL, N_LARGE = _arg("--small", 8), _arg("--large", 32)


def run(cpus: int, urls: int) -> dict:
    out = subprocess.run(
        [sys.executable, "/root/repo/tools/drain_once.py",
         "--cpus", str(cpus), "--urls", str(urls)],
        capture_output=True, text=True, timeout=1800, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    urls = int(sys.argv[sys.argv.index("--urls") + 1]) if "--urls" in sys.argv else 50_000
    small = run(N_SMALL, urls)
    large = run(N_LARGE, urls)
    speedup = large["urls_per_sec"] / small["urls_per_sec"]
    eff = speedup / (N_LARGE / N_SMALL)
    result = {
        "metric": "frontier_drain_scaling",
        "urls": urls,
        f"local[{N_SMALL}]": small,
        f"local[{N_LARGE}]": large,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
    }
    print(json.dumps(result))
    if "--record" in sys.argv:
        with open("/root/repo/BASELINE.md", "a") as fh:
            fh.write(
                "\n## Measured scaling evidence (this round)\n\n"
                f"- input: {urls} seeded frontier URLs, identical for both runs\n"
                f"- local[{N_SMALL}]: {small['urls_per_sec']} URLs/s "
                f"({small['attempted']} attempted, {small['validated']} "
                f"validated, {small['wall_sec']} s)\n"
                f"- local[{N_LARGE}]: {large['urls_per_sec']} URLs/s "
                f"({large['attempted']} attempted, {large['validated']} "
                f"validated, {large['wall_sec']} s)\n"
                f"- speedup {result['speedup']}x over 4x cores → scaling "
                f"efficiency **{result['scaling_efficiency']}** "
                f"(north-rule target ≥0.8)\n"
            )


if __name__ == "__main__":
    main()
