"""Full-registry endurance sweep in DRIVER-SHAPED chunks: 50 queries per
fresh vanilla JVM (subprocess per chunk), mirroring the external
driver's window shape at any SF. Exists because a single 290-query
vanilla session (1g default heap) accumulates cached signature frames
and localCheckpoint blocks faster than the async ContextCleaner reaps
them, and a late broadcast build can OOM — a harness artifact, not a
query defect (every such failure passes in isolation; tools/check.py
also clears caches + GCs between queries now). Usage:

    python tools/sweep_chunks.py /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from ror_etl_spark import registry

    registry.load_all()
    names = sorted(registry.QUERIES)
    total_pass = total_fail = total_rows = 0
    here = os.path.dirname(os.path.abspath(__file__))
    for i in range(0, len(names), chunk):
        batch = names[i : i + chunk]
        out = subprocess.run(
            [
                sys.executable,
                os.path.join(here, "check.py"),
                "--vanilla",
                "--sf",
                sf,
                "--only",
                ",".join(batch),
            ],
            capture_output=True,
            text=True,
        )
        tail = [
            line
            for line in out.stdout.splitlines()
            if " pass, " in line or line.startswith("FAIL")
        ]
        for line in tail:
            print(f"chunk {i // chunk}: {line}", flush=True)
        summary = next((line for line in tail if " pass, " in line), "")
        try:
            p, f, r = (
                int(summary.split(" pass, ")[0]),
                int(summary.split(" pass, ")[1].split(" fail")[0]),
                int(summary.split("fail, ")[1].split(" rows-only")[0]),
            )
        except (IndexError, ValueError):
            print(f"chunk {i // chunk}: UNPARSEABLE ({out.returncode})")
            print(out.stdout[-2000:])
            print(out.stderr[-2000:])
            f, p, r = len(batch), 0, 0
        total_pass += p
        total_fail += f
        total_rows += r
    print(f"TOTAL: {total_pass} pass, {total_fail} fail, {total_rows} rows-only")

    # Close-out artifact (VERDICT r9 item 4): record the sweep so "every
    # registered query green at sf0.1 in driver-shaped chunks" is a
    # checked-in JSON fact per round, not a NOTES claim. Overwrites the
    # file for the same sf; the git history keeps prior rounds.
    import json

    tag = os.path.basename(sf.rstrip("/"))
    artifact = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"SWEEP_{tag}.json",
    )
    with open(artifact, "w") as fh:
        json.dump(
            {
                "sf_dir": sf,
                "chunk": chunk,
                "n_queries": len(names),
                "pass": total_pass,
                "fail": total_fail,
                "rows_only": total_rows,
            },
            fh,
        )
        fh.write("\n")
    print(f"wrote {artifact}")


if __name__ == "__main__":
    main()
