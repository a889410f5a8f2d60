#!/usr/bin/env python3
"""Attribute Spark event-log time to bench queries (guide §1.5/§7.1).

Usage: python3 tools/profile_eventlog.py /tmp/graft-eventlog/<app-id> [query ...]

Groups jobs by their job description (Bench sets it to the query name),
reporting per query: #jobs, summed job wall-clock, and per-stage breakdown
(task time, shuffle read/write bytes, #tasks) for the named queries (or the
10 most expensive when none are named).
"""
import json, sys, collections

def main():
    path = sys.argv[1]
    want = set(sys.argv[2:])
    jobs = {}            # jobId -> (desc, submit_ms, end_ms, [stageIds])
    stage_info = {}      # stageId -> dict
    stage_job = {}       # stageId -> jobId
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                desc = ev.get("Properties", {}).get("spark.job.description", "")
                sids = [s["Stage ID"] for s in ev.get("Stage Infos", [])]
                jobs[jid] = {"desc": desc, "t0": ev["Submission Time"], "t1": None, "stages": sids}
                for s in sids:
                    stage_job[s] = jid
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                stage_info[sid] = {
                    "name": si.get("Stage Name", "")[:80],
                    "tasks": si.get("Number of Tasks", 0),
                    "t0": si.get("Submission Time"),
                    "t1": si.get("Completion Time"),
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                d = stage_info.setdefault(sid, {})
                m = ev.get("Task Metrics") or {}
                d["run_ms"] = d.get("run_ms", 0) + m.get("Executor Run Time", 0)
                d["gc_ms"] = d.get("gc_ms", 0) + m.get("JVM GC Time", 0)
                srm = m.get("Shuffle Read Metrics") or {}
                d["sr_bytes"] = d.get("sr_bytes", 0) + srm.get("Remote Bytes Read", 0) + srm.get("Local Bytes Read", 0)
                swm = m.get("Shuffle Write Metrics") or {}
                d["sw_bytes"] = d.get("sw_bytes", 0) + swm.get("Shuffle Bytes Written", 0)
                d["n_done"] = d.get("n_done", 0) + 1

    per_q = collections.defaultdict(lambda: {"jobs": 0, "ms": 0, "stages": []})
    for jid, j in sorted(jobs.items()):
        if j["t1"] is None:
            continue
        q = j["desc"] or "(unlabeled)"
        per_q[q]["jobs"] += 1
        per_q[q]["ms"] += j["t1"] - j["t0"]
        per_q[q]["stages"].extend(j["stages"])

    order = sorted(per_q.items(), key=lambda kv: -kv[1]["ms"])
    show = [q for q, _ in order if not want or q.split(" ")[0] in want]
    print(f"{'query':40s} {'jobs':>5s} {'job-wall-s':>10s}")
    for q, d in order:
        if want and q.split(" ")[0] not in want:
            continue
        print(f"{q:40s} {d['jobs']:5d} {d['ms']/1000:10.2f}")
    detail = show if want else show[:10]
    for q in detail:
        d = per_q[q]
        print(f"\n=== {q}: {d['jobs']} jobs, {d['ms']/1000:.2f}s job wall ===")
        for sid in d["stages"]:
            s = stage_info.get(sid)
            if not s or s.get("t0") is None or s.get("t1") is None:
                continue
            wall = (s["t1"] - s["t0"]) / 1000
            if wall < 0.02:
                continue
            print(f"  stage {sid:5d} wall {wall:7.2f}s run {s.get('run_ms',0)/1000:7.2f}s "
                  f"gc {s.get('gc_ms',0)/1000:5.2f}s tasks {s.get('tasks',0):4d} "
                  f"sread {s.get('sr_bytes',0)>>10:8d}K swrite {s.get('sw_bytes',0)>>10:8d}K  {s.get('name','')}")

if __name__ == "__main__":
    main()
