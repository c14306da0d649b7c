"""Parse a Spark event log into per-job-description timing: for each job
description (the bench query name set via setJobDescription), report job
count, summed job wall-clock, summed task time, and scheduling gaps
(time between consecutive jobs of the same description).

Usage: python tools/evlog_profile.py /tmp/evlog/<app-id> [--stages name]
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main() -> None:
    path = sys.argv[1]
    want_stages = sys.argv[3] if len(sys.argv) > 3 and sys.argv[2] == "--stages" else None
    jobs = {}  # job_id -> dict
    stage_to_job = {}
    stages = {}
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                ) or ""
                jobs[jid] = {
                    "desc": desc,
                    "start": ev["Submission Time"],
                    "end": None,
                    "task_ms": 0,
                    "stages": [],
                }
                for sid in ev.get("Stage IDs", []):
                    stage_to_job[sid] = jid
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                name = si.get("Stage Name", "")
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                nt = si.get("Number of Tasks", 0)
                stages[sid] = {
                    "name": name.split("\n")[0][:80],
                    "wall_ms": (comp - sub) if sub and comp else 0,
                    "n_tasks": nt,
                }
                jid = stage_to_job.get(sid)
                if jid is not None and jid in jobs:
                    jobs[jid]["stages"].append(sid)
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                jid = stage_to_job.get(sid)
                metrics = ev.get("Task Metrics") or {}
                rt = metrics.get("Executor Run Time", 0)
                if jid is not None and jid in jobs:
                    jobs[jid]["task_ms"] += rt

    by_desc = defaultdict(lambda: {"n_jobs": 0, "wall_ms": 0, "task_ms": 0,
                                   "gap_ms": 0, "span_ms": 0, "jobs": []})
    for jid in sorted(jobs):
        j = jobs[jid]
        if j["end"] is None:
            continue
        d = by_desc[j["desc"]]
        d["n_jobs"] += 1
        d["wall_ms"] += j["end"] - j["start"]
        d["task_ms"] += j["task_ms"]
        d["jobs"].append((jid, j["start"], j["end"], j["task_ms"], j["stages"]))
    for desc, d in by_desc.items():
        js = sorted(d["jobs"], key=lambda x: x[1])
        if js:
            d["span_ms"] = js[-1][2] - js[0][1]
            for (_, s, _, _, _), (_, _, e_prev, _, _) in zip(js[1:], js[:-1]):
                d["gap_ms"] += max(0, s - e_prev)

    print(f"{'description':45s} {'jobs':>4s} {'span_s':>7s} {'wall_s':>7s} "
          f"{'gap_s':>6s} {'task_s':>7s}")
    for desc in sorted(by_desc, key=lambda k: -by_desc[k]["span_ms"]):
        d = by_desc[desc]
        print(f"{(desc or '<none>')[:45]:45s} {d['n_jobs']:4d} "
              f"{d['span_ms']/1e3:7.2f} {d['wall_ms']/1e3:7.2f} "
              f"{d['gap_ms']/1e3:6.2f} {d['task_ms']/1e3:7.2f}")
        if want_stages and want_stages in (desc or ""):
            for jid, s, e, tms, sids in sorted(d["jobs"], key=lambda x: x[1]):
                print(f"  job {jid}: wall {(e-s)/1e3:6.2f}s task {tms/1e3:6.2f}s")
                for sid in sids:
                    st = stages.get(sid)
                    if st:
                        print(f"    stage {sid} [{st['n_tasks']:3d} tasks, "
                              f"{st['wall_ms']/1e3:6.2f}s] {st['name']}")


if __name__ == "__main__":
    main()
