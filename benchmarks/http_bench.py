"""HTTP front end under CONCURRENT load (round-4 verdict #7).

The round-4 HTTP number (13.7 req/s) was a SERIAL closed loop — a latency
measurement mislabeled as a throughput bound, while the engine behind the
server sustains ~500/s. This drives ``serving/http.py`` with N threaded
closed-loop clients (and optionally an open-loop Poisson client), so the
ThreadingHTTPServer + engine futures actually coalesce:

    python benchmarks/http_bench.py [--clients 1 8 32 64] [--secs 10]
    python benchmarks/http_bench.py --poisson 100 200 400

Reports sustained req/s + p50/p99 per point; numbers land in BASELINE.md.
"""

import argparse
import http.client
import json
import os
import socket
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (bench.py: shared protocol constants)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _post(port, payload, conn=None):
    c = conn or http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    c.request("POST", "/generate", json.dumps(payload),
              {"Content-Type": "application/json"})
    r = c.getresponse()
    body = r.read()
    if r.status != 200:
        raise RuntimeError(f"HTTP {r.status}: {body[:200]}")
    return c


def start_server():
    import jax
    from kmbart_tpu.config import bart_base_config
    from kmbart_tpu.models.conditional import init_conditional_params
    from kmbart_tpu.serving.engine import GenerationEngine
    from kmbart_tpu.serving.http import serve

    cfg = bart_base_config()
    params = jax.device_put(
        init_conditional_params(jax.random.PRNGKey(0), cfg))
    buckets = (16, 48, 112, 160)
    eng = GenerationEngine(params, cfg, max_batch_size=buckets[-1],
                           encoder_seq_len=bench.ENC_LEN,
                           batch_buckets=buckets, max_wait_ms=5.0,
                           num_beams=bench.BEAMS, max_length=bench.MAX_LEN,
                           early_stopping=True)
    rng = np.random.default_rng(0)
    for b in buckets:  # pre-compile
        eng.submit(rng.integers(4, 50000,
                                (b, bench.ENC_LEN)).astype(np.int32)).result()
    port = _free_port()
    server = serve(eng, port=port, block=False)
    return eng, server, port


def closed_loop(port, n_clients, secs, ids_pool):
    lat, lock = [], threading.Lock()
    stop = time.perf_counter() + secs

    def client(cid):
        conn = None
        i = cid
        while time.perf_counter() < stop:
            t0 = time.perf_counter()
            payload = {"input_ids": ids_pool[i % len(ids_pool)]}
            try:
                conn = _post(port, payload, conn)
            except Exception:
                conn = None
                continue
            with lock:
                lat.append(time.perf_counter() - t0)
            i += n_clients
    threads = [threading.Thread(target=client, args=(c,))
               for c in range(n_clients)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    return _stats(lat, wall)


def poisson_loop(port, rate, secs, ids_pool):
    lat, lock = [], threading.Lock()
    rng = np.random.default_rng(1)
    gaps = rng.exponential(1.0 / rate, size=int(rate * secs * 1.2))
    threads = []

    def one(i):
        t0 = time.perf_counter()
        try:
            _post(port, {"input_ids": ids_pool[i % len(ids_pool)]}).close()
        except Exception:
            return
        with lock:
            lat.append(time.perf_counter() - t0)

    t_start = time.perf_counter()
    n = 0
    for gap in gaps:
        target = t_start + gaps[:n + 1].sum()
        now = time.perf_counter()
        if now > t_start + secs:
            break
        if target > now:
            time.sleep(target - now)
        th = threading.Thread(target=one, args=(n,))
        th.start()
        threads.append(th)
        n += 1
    for th in threads:
        th.join(timeout=60)
    wall = time.perf_counter() - t_start
    return _stats(lat, wall)


def _stats(lat, wall):
    arr = np.sort(np.asarray(lat)) * 1e3
    return {"n": len(lat), "sustained": round(len(lat) / wall, 1),
            "p50_ms": round(float(np.percentile(arr, 50)), 1),
            "p99_ms": round(float(np.percentile(arr, 99)), 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, nargs="*",
                    default=[1, 8, 32, 64])
    ap.add_argument("--poisson", type=float, nargs="*", default=[])
    ap.add_argument("--secs", type=float, default=10.0)
    args = ap.parse_args()

    eng, server, port = start_server()
    rng = np.random.default_rng(0)
    ids_pool = [rng.integers(4, 50000, (1, bench.ENC_LEN)).astype(
        np.int32).tolist() for _ in range(64)]
    try:
        if args.poisson:
            print(f"{'offered/s':>10} {'sustained/s':>12} "
                  f"{'p50_ms':>8} {'p99_ms':>8}")
            for r in args.poisson:
                s = poisson_loop(port, r, args.secs, ids_pool)
                print(f"{r:>10} {s['sustained']:>12} {s['p50_ms']:>8} "
                      f"{s['p99_ms']:>8}", flush=True)
        else:
            print(f"{'clients':>8} {'sustained/s':>12} "
                  f"{'p50_ms':>8} {'p99_ms':>8}")
            for c in args.clients:
                s = closed_loop(port, c, args.secs, ids_pool)
                print(f"{c:>8} {s['sustained']:>12} {s['p50_ms']:>8} "
                      f"{s['p99_ms']:>8}", flush=True)
    finally:
        server.shutdown()
        eng.shutdown()


if __name__ == "__main__":
    main()
