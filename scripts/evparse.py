"""Event-log summarizer shared by the profiling scripts."""
import glob, gzip, json, os


def stage_metrics(evdir: str) -> dict[int, dict]:
    stages: dict[int, dict] = {}
    names: dict[int, str] = {}
    paths = [p for p in glob.glob(os.path.join(evdir, "**", "*"), recursive=True)
             if os.path.isfile(p) and "appstatus" not in os.path.basename(p)]
    for path in paths:
        if path.endswith(".zstd"):
            import io
            import subprocess
            raw = subprocess.run(["zstd", "-dc", path],
                                 capture_output=True).stdout
            op = lambda p, m: io.StringIO(raw.decode())  # noqa: E731
        else:
            op = gzip.open if path.endswith(".gz") else open
        with op(path, "rt") as f:
            for line in f:
                ev = json.loads(line)
                kind = ev.get("Event")
                if kind == "SparkListenerStageSubmitted":
                    si = ev["Stage Info"]
                    names[si["Stage ID"]] = si.get("Stage Name", "")
                if kind == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sub, comp = si.get("Submission Time"), si.get("Completion Time")
                    if sub and comp:
                        stages.setdefault(si["Stage ID"], {}).setdefault(
                            "wall", 0)
                        stages[si["Stage ID"]]["wall"] += comp - sub
                if kind != "SparkListenerTaskEnd":
                    continue
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                s = stages.setdefault(sid, {})
                for key in ("tasks", "run", "cpu", "gc", "memspill",
                            "diskspill", "shwrite_t", "fetchwait",
                            "input", "shw", "shr"):
                    s.setdefault(key, 0)
                s["tasks"] += 1
                s["run"] += m.get("Executor Run Time", 0)
                s["cpu"] += m.get("Executor CPU Time", 0) // 1_000_000
                s["gc"] += m.get("JVM GC Time", 0)
                s["memspill"] += m.get("Memory Bytes Spilled", 0)
                s["diskspill"] += m.get("Disk Bytes Spilled", 0)
                sw = m.get("Shuffle Write Metrics") or {}
                s["shwrite_t"] += sw.get("Shuffle Write Time", 0) // 1_000_000
                s["shw"] += sw.get("Shuffle Bytes Written", 0)
                sr = m.get("Shuffle Read Metrics") or {}
                s["fetchwait"] += sr.get("Fetch Wait Time", 0)
                s["shr"] += (sr.get("Local Bytes Read", 0)
                             + sr.get("Remote Bytes Read", 0))
                inp = m.get("Input Metrics") or {}
                s["input"] += inp.get("Bytes Read", 0)
    for sid, s in stages.items():
        s["name"] = names.get(sid, "")[:60].replace("\n", " ")
        for key in ("tasks", "run", "cpu", "gc", "memspill", "diskspill",
                    "shwrite_t", "fetchwait", "input", "shw", "shr", "wall"):
            s.setdefault(key, 0)
    return stages


def print_stages(stages: dict[int, dict], min_run_ms: int = 2000) -> None:
    for sid in sorted(stages):
        s = stages[sid]
        if s["run"] < min_run_ms:
            continue
        print(f"  stage {sid:3d} [{s['name']}]: tasks={s['tasks']} "
              f"wall={s['wall']/1000:.1f}s "
              f"run={s['run']/1000:.0f}s cpu={s['cpu']/1000:.0f}s "
              f"gc={s['gc']/1000:.0f}s "
              f"spill={s['diskspill']>>20}MB shw={s['shw']>>20}MB "
              f"shwt={s['shwrite_t']/1000:.0f}s shr={s['shr']>>20}MB "
              f"fw={s['fetchwait']/1000:.0f}s in={s['input']>>20}MB")
