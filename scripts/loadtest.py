#!/usr/bin/env python
"""HTTP load test for the serving layer.

Hammers POST /search (and optionally /rerank) with concurrent client
threads and reports achieved QPS + latency percentiles — the
operational view of serving throughput (the device-level view lives in
bench.py).

Usage:
  python scripts/loadtest.py --url http://127.0.0.1:8000 \
      --threads 16 --duration 10 --queries-per-request 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--url", default="http://127.0.0.1:8000")
    parser.add_argument("--threads", type=int, default=16)
    parser.add_argument("--duration", type=float, default=10.0)
    parser.add_argument("--queries-per-request", type=int, default=8)
    parser.add_argument("--endpoint", default="/search",
                        choices=["/search", "/search_rerank"])
    parser.add_argument("--k", type=int, default=10)
    args = parser.parse_args()

    stop = time.time() + args.duration
    latencies: list = []
    counts = [0] * args.threads
    errors = [0] * args.threads
    lock = threading.Lock()

    def worker(tid: int) -> None:
        i = 0
        while time.time() < stop:
            queries = [
                f"load test query {tid} {i} {j}"
                for j in range(args.queries_per_request)
            ]
            payload = json.dumps({"queries": queries, "k": args.k}).encode()
            req = urllib.request.Request(
                args.url + args.endpoint,
                data=payload,
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            t0 = time.time()
            try:
                with urllib.request.urlopen(req, timeout=60) as resp:
                    body = json.loads(resp.read())
                    if "error" in body:
                        errors[tid] += 1
                    else:
                        counts[tid] += args.queries_per_request
            except Exception:
                errors[tid] += 1
            with lock:
                latencies.append(time.time() - t0)
            i += 1

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(args.threads)
    ]
    t_start = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.time() - t_start

    total = sum(counts)
    lat = sorted(latencies)
    if not lat:
        print("no requests completed")
        return
    print(
        json.dumps(
            {
                "endpoint": args.endpoint,
                "threads": args.threads,
                "queries": total,
                "errors": sum(errors),
                "qps": round(total / elapsed, 1),
                "latency_ms": {
                    "p50": round(1e3 * lat[len(lat) // 2], 1),
                    "p95": round(1e3 * lat[int(len(lat) * 0.95)], 1),
                    "p99": round(1e3 * lat[min(len(lat) - 1, int(len(lat) * 0.99))], 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
