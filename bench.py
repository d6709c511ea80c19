"""Benchmark: WBFM receive chain throughput per chip (BASELINE config 2).

Device-resident methodology: the input block lives on device, the whole
chain (channelize -> FM demod -> resample -> deemphasis) is one jitted
program, and states are donated between iterations. Host<->device
traffic is excluded from the steady-state measurement (the remote PJRT
tunnel used in this environment adds ~100 ms RTT per transfer, which is
an attachment artifact, not framework throughput; production ingest is
the double-buffered host pipeline).

Prints one JSON line:
  {"metric": "wbfm_chain_throughput", "value": <Msamp/s/chip>,
   "unit": "Msamp/s", "vs_baseline": value/100}
(baseline: the 100 Msamp/s/chip north-star in BASELINE.md).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def supervise():
    """Run the measurement in a child process with timeout + retries.

    The remote TPU attachment occasionally wedges at backend init
    (observed: >25 min hangs that a fresh process after a cooldown
    clears). The child does the real work; the parent enforces a
    deadline and retries, forwarding the child's JSON line.
    """
    attempts = int(os.environ.get("GRBAZ_BENCH_ATTEMPTS", "3"))
    timeout = float(os.environ.get("GRBAZ_BENCH_TIMEOUT", "540"))
    env = dict(os.environ, GRBAZ_BENCH_CHILD="1")
    for attempt in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-u", os.path.abspath(__file__)],
                               env=env, timeout=timeout,
                               stdout=subprocess.PIPE)
            out = r.stdout.decode(errors="replace").strip().splitlines()
            line = next((l for l in reversed(out) if l.startswith("{")), None)
            if r.returncode == 0 and line:
                print(line, flush=True)
                return 0
            log(f"bench: child attempt {attempt + 1} failed "
                f"(rc={r.returncode})")
        except subprocess.TimeoutExpired:
            log(f"bench: child attempt {attempt + 1} timed out after "
                f"{timeout:.0f}s (wedged attachment?)")
        if attempt + 1 < attempts:
            time.sleep(60)  # tunnel cooldown before a fresh process
    log("bench: all attempts failed")
    return 1


def main():
    # Persistent compilation cache: first run through the remote tunnel
    # compiles in O(minutes); later runs (the driver's scoring run) hit
    # the cache and start in seconds.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)

    import jax
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from grbaz_tpu.models.wbfm import WBFMConfig, build_wbfm
    from grbaz_tpu.core.stream import Stream, StreamMeta

    block = 1 << 20
    cfg = WBFMConfig(block_size=block)
    fg, _ = build_wbfm(cfg)
    step = fg.build_step()

    # Everything (input synthesis included) inside jit: nothing crosses
    # the host boundary except the final scalar checksum.
    def make_ins():
        n = cfg.block_size
        t = jnp.arange(n, dtype=jnp.float32)
        x = jnp.exp(1j * (2 * jnp.pi * (cfg.center_freq + 10e3)
                          / cfg.sample_rate) * t).astype(jnp.complex64)
        meta = StreamMeta.start(cfg.sample_rate)
        return {"iq": Stream(data=x, count=jnp.int32(n), meta=meta)}

    @jax.jit
    def init_all():
        states = jax.tree_util.tree_map(jnp.asarray, fg.init_states())
        return states, make_ins()

    jit_step = jax.jit(step, donate_argnums=(0,))

    params = fg.init_params()
    log(f"bench: backend={jax.default_backend()}, compiling init ...")
    states, ins = init_all()
    jax.block_until_ready(states)
    log("bench: init done, compiling chain step ...")
    # warmup / compile
    t0 = time.time()
    states, outs = jit_step(states, params, ins)
    jax.block_until_ready(states)
    log(f"bench: chain compiled+warm in {time.time() - t0:.1f}s, timing ...")

    # median of N trials with spread: the remote attachment shows
    # run-to-run variance (±30% observed r2); one number hides it
    reps, trials = 30, 5
    samples = []
    for _ in range(trials):
        t0 = time.time()
        for _ in range(reps):
            states, outs = jit_step(states, params, ins)
        jax.block_until_ready(states)
        samples.append(reps * block / (time.time() - t0) / 1e6)
    samples.sort()
    msps = samples[len(samples) // 2]

    # sanity: audio must be finite and non-degenerate (fetch one scalar)
    chk = float(np.asarray(jax.jit(lambda s: jnp.sum(jnp.abs(s.data)))(outs["audio"])))
    assert np.isfinite(chk), "bench produced non-finite audio"

    print(json.dumps({
        "metric": "wbfm_chain_throughput",
        "value": round(msps, 2),
        "unit": "Msamp/s",
        "vs_baseline": round(msps / 100.0, 4),
        "median_of": trials,
        "min": round(samples[0], 2),
        "max": round(samples[-1], 2),
    }))


if __name__ == "__main__":
    if os.environ.get("GRBAZ_BENCH_CHILD"):
        main()
    else:
        sys.exit(supervise())
