"""Client-side load sweep against a running serving daemon.

Runs in its OWN process (the bench forks it) so client-side work —
thread scheduling, JSON parsing of responses — does not share a GIL
with the server under test; the reference's perf harness likewise runs
its clients outside the FastAPI process
(perf_test/enhanced_performance_test.py).

stdin: JSON {"url": ..., "questions": [...], "steps": [1,4,...],
             "requests_per_step": N}
stdout: one JSON line: {"steps": [per-step metrics...]}
"""

import concurrent.futures
import json
import statistics
import sys
import time
import urllib.request


def one_request(url: str, q: str) -> dict:
    # question-only payload, exactly the reference harness's request
    # (enhanced_performance_test.py:237) — server defaults apply
    # (top_k=10, hops=1, RagBody main.py:45-53)
    body = json.dumps({"question": q}).encode()
    req = urllib.request.Request(
        url, data=body, method="POST",
        headers={"Content-Type": "application/json"})
    t = time.time()
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        ok = bool(out.get("success"))
    except Exception:
        ok = False
    return {"latency_s": time.time() - t, "ok": ok}


def main() -> None:
    cfg = json.loads(sys.stdin.read())
    url, questions = cfg["url"], cfg["questions"]
    n_req = int(cfg.get("requests_per_step", 24))

    one_request(url, questions[0])  # connection + code-path warm-up

    steps = []
    for users in cfg.get("steps", [1, 4, 8, 16]):
        t_step = time.time()
        with concurrent.futures.ThreadPoolExecutor(max_workers=users) as ex:
            results = list(ex.map(
                lambda i: one_request(url, questions[i % len(questions)]),
                range(n_req)))
        dur = time.time() - t_step
        lat = sorted(r["latency_s"] for r in results)
        steps.append({
            "concurrent_users": users,
            "requests": len(results),
            "success_rate": round(sum(r["ok"] for r in results) / len(results), 3),
            "throughput_rps": round(len(results) / dur, 2),
            "avg_latency_s": round(statistics.fmean(lat), 4),
            "median_latency_s": round(statistics.median(lat), 4),
            "p95_latency_s": round(lat[min(len(lat) - 1, int(0.95 * len(lat)))], 4),
            "min_latency_s": round(lat[0], 4),
            "max_latency_s": round(lat[-1], 4),
        })
    print(json.dumps({"steps": steps}))


if __name__ == "__main__":
    main()
