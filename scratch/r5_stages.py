"""Round-5 honest per-stage timing: scan + forced fetch, ONE stage per
process (second-program collapse). argv[1] selects the stage.

Methodology (verify SKILL.md): rep loop on device via lax.scan, forced
f32 value fetch as the fence, measured fetch RTT subtracted.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from grbaz_tpu.core.stream import Stream, StreamMeta

stage = sys.argv[1]
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 512
block = 1 << 20
fs = 3.2e6
quad_n = block // 8
quad_fs = fs / 8
RATIO = quad_fs / 48e3


def tone(n, f, sr):
    t = jnp.arange(n, dtype=jnp.float32)
    return jnp.exp(1j * (2 * jnp.pi * f / sr) * t).astype(jnp.complex64)


def ftone(n, f, sr):
    t = jnp.arange(n, dtype=jnp.float32)
    return jnp.sin((2 * jnp.pi * f / sr) * t)


blk = None
per_block_samples = block  # for Msamp/s normalization (chain-equivalent)

def _osum(y):
    """f32 checksum of an output array (forces its computation)."""
    if jnp.iscomplexobj(y):
        return jnp.sum(y.real) + jnp.sum(y.imag)
    return jnp.sum(y.astype(jnp.float32))


if stage == "chain":
    from grbaz_tpu.models.wbfm import WBFMConfig, build_wbfm
    cfg = WBFMConfig(block_size=block)
    fg, _ = build_wbfm(cfg)
    step = fg.build_step()
    mk = lambda: {"iq": Stream(data=tone(block, 10e3, fs),
                               count=jnp.int32(block),
                               meta=StreamMeta.start(fs))}
    def apply_fn(st, pr, xs):
        st2, outs = step(st, pr, xs)
        return st2, _osum(outs["audio"].data)
    init_state = lambda: fg.init_states()
    init_params = lambda: fg.init_params()
elif stage in ("chan_rtf0", "chan_rtf1"):
    from grbaz_tpu.ops.fir import FreqXlatingFIRDecimator, low_pass_taps
    taps = low_pass_taps(1.0, fs, 112.5e3, 75e3)
    blk = FreqXlatingFIRDecimator(taps, 8, 0.0, fs,
                                  rotate_taps=(stage == "chan_rtf1"))
    mk = lambda: Stream(data=tone(block, 10e3, fs), count=jnp.int32(block),
                        meta=StreamMeta.start(fs))
elif stage in ("chan_pallas", "chan_pallas_d"):
    from grbaz_tpu.ops.fir import low_pass_taps, prepare_taps
    from grbaz_tpu.ops.pallas import wbfm_frontend as wf
    taps = low_pass_taps(1.0, fs, 112.5e3, 75e3)
    h = prepare_taps(taps, 8)
    prec = "high" if stage == "chan_pallas" else "default"
    tpad = int(h.shape[0])
    mk = lambda: Stream(data=tone(block, 10e3, fs), count=jnp.int32(block),
                        meta=StreamMeta.start(fs))
    def apply_fn(st, pr, xs):
        frame = jnp.concatenate([st["tail"][1:], xs.data])
        yf = wf.xlating_fir_frame_pallas(frame, h, 8, pr["inc"],
                                         precision=prec)
        return dict(tail=xs.data[-tpad:]), _osum(yf)
    init_state = lambda: dict(tail=np.zeros((tpad,), np.complex64))
    init_params = lambda: dict(inc=np.uint32(123456789))
elif stage == "chain_casc":
    from grbaz_tpu.models.wbfm import WBFMConfig, build_wbfm
    cfg = WBFMConfig(block_size=block, audio_chain="cascade")
    fg, _ = build_wbfm(cfg)
    step = fg.build_step()
    mk = lambda: {"iq": Stream(data=tone(block, 10e3, fs),
                               count=jnp.int32(block),
                               meta=StreamMeta.start(fs))}
    def apply_fn(st, pr, xs):
        st2, outs = step(st, pr, xs)
        return st2, _osum(outs["audio"].data)
    init_state = lambda: fg.init_states()
    init_params = lambda: fg.init_params()
elif stage == "audio_aa":
    from grbaz_tpu.ops.fir import FIRDecimator, low_pass_taps
    aa_n = block // 8
    blk = FIRDecimator(low_pass_taps(1.0, fs/8, 0.45*48e3, 0.2*48e3,
                                     window="blackmanharris"), 8,
                       dtype=jnp.float32)
    mk = lambda: Stream(data=ftone(aa_n, 1e3, fs/8),
                        count=jnp.int32(aa_n),
                        meta=StreamMeta.start(fs/8))
    per_block_samples = block
elif stage == "resamp_residual":
    from grbaz_tpu.ops.resampler import FractionalResampler
    rn = block // 64
    blk = FractionalResampler(rn, (fs/64)/48e3, dtype=jnp.float32)
    mk = lambda: Stream(data=ftone(rn, 1e3, fs/64),
                        count=jnp.int32(rn),
                        meta=StreamMeta.start(fs/64))
    per_block_samples = block
elif stage == "rot":
    from grbaz_tpu.ops import exact
    mk = lambda: Stream(data=tone(block, 10e3, fs), count=jnp.int32(block),
                        meta=StreamMeta.start(fs))
    def apply_fn(st, pr, xs):
        lo, ph = exact.oscillator(block, st["phase"], pr["inc"])
        y = xs.data * lo
        return dict(phase=ph, last=y[-1]), _osum(y)
    init_state = lambda: dict(phase=np.uint32(0), last=np.complex64(0))
    init_params = lambda: dict(inc=np.uint32(123456789))
elif stage == "fir_only":
    # the polyphase matmul body alone, pre-rotated input (chain default
    # bf16 precision)
    from grbaz_tpu.ops.fir import (fir_decimate_tail_block, low_pass_taps,
                                   prepare_taps)
    taps = low_pass_taps(1.0, fs, 112.5e3, 75e3)
    h = prepare_taps(taps, 8)
    tpad = int(h.shape[0])
    mk = lambda: Stream(data=tone(block, 10e3, fs), count=jnp.int32(block),
                        meta=StreamMeta.start(fs))
    def apply_fn(st, pr, xs):
        y = fir_decimate_tail_block(st["tail"], xs.data, jnp.asarray(h), 8,
                                    precision=jax.lax.Precision.DEFAULT)
        return dict(tail=xs.data[-tpad:]), _osum(y)
    init_state = lambda: dict(tail=np.zeros((tpad,), np.complex64))
    init_params = lambda: dict()
elif stage in ("chan_pallas_rtf", "chan_pallas_rtf_hi"):
    from grbaz_tpu.ops.fir import low_pass_taps, prepare_taps
    from grbaz_tpu.ops.pallas import wbfm_frontend as wf
    taps = low_pass_taps(1.0, fs, 112.5e3, 75e3)
    h = prepare_taps(taps, 8)
    prec = "default" if stage == "chan_pallas_rtf" else "highest"
    tpad = int(h.shape[0])
    mk = lambda: Stream(data=tone(block, 10e3, fs), count=jnp.int32(block),
                        meta=StreamMeta.start(fs))
    def apply_fn(st, pr, xs):
        frame = jnp.concatenate([st["tail"][1:], xs.data])
        y = wf.xlating_fir_frame_pallas_rtf(frame, h, 8, st["phase"],
                                            pr["inc"], precision=prec)
        ph = st["phase"].astype(jnp.uint32) + jnp.uint32(block) * pr["inc"]
        return dict(tail=xs.data[-tpad:], phase=ph), _osum(y)
    init_state = lambda: dict(tail=np.zeros((tpad,), np.complex64),
                              phase=np.uint32(0))
    init_params = lambda: dict(inc=np.uint32(123456789))
elif stage == "osc":
    from grbaz_tpu.ops import exact
    mk = lambda: Stream(data=tone(block, 10e3, fs), count=jnp.int32(block),
                        meta=StreamMeta.start(fs))
    def apply_fn(st, pr, xs):
        lo, ph = exact.oscillator(block, st["phase"], pr["inc"])
        y = xs.data * lo
        return dict(phase=ph, last=y[-1]), _osum(y)
    init_state = lambda: dict(phase=np.uint32(0),
                              last=np.complex64(0))
    init_params = lambda: dict(inc=np.uint32(123456789))
elif stage == "demod":
    from grbaz_tpu.ops.demod import QuadratureDemod
    blk = QuadratureDemod(1.0)
    mk = lambda: Stream(data=tone(quad_n, 10e3, quad_fs),
                        count=jnp.int32(quad_n),
                        meta=StreamMeta.start(quad_fs))
elif stage in ("resamp", "resamp_tight"):
    from grbaz_tpu.ops.resampler import FractionalResampler
    min_ratio = RATIO * (0.96 if stage == "resamp_tight" else 0.5)
    blk = FractionalResampler(quad_n, RATIO, dtype=jnp.float32,
                              min_ratio=min_ratio)
    print(f"# resamp capacity={blk.capacity}", file=sys.stderr, flush=True)
    mk = lambda: Stream(data=ftone(quad_n, 1e3, quad_fs),
                        count=jnp.int32(quad_n),
                        meta=StreamMeta.start(quad_fs))
elif stage in ("deemph", "deemph16k"):
    from grbaz_tpu.ops.demod import FMDeemphasis
    n = 31459 if stage == "deemph" else 16384
    blk = FMDeemphasis(48e3, 75e-6)
    cnt = 15728 if stage == "deemph" else 16384
    mk = lambda: Stream(data=ftone(n, 1e3, 48e3), count=jnp.int32(cnt),
                        meta=StreamMeta.start(48e3))
else:
    raise SystemExit(f"unknown stage {stage}")

if blk is not None:
    def apply_fn(st, pr, xs):
        st2, outs = blk.apply(st, pr, xs)
        return st2, _osum(outs[0].data)
    init_state = lambda: blk.init_state()
    init_params = lambda: blk.init_params()


@jax.jit
def init_all():
    st = jax.tree_util.tree_map(jnp.asarray, init_state())
    return st, mk()


def _poison(data, osum):
    """data + 0*osum: keeps the array bit-identical but makes it
    formally iteration-dependent (float NaN semantics forbid folding
    0*x), so XLA can neither hoist the kernel out of the scan (LICM)
    nor dead-code-eliminate it."""
    z = (0.0 * osum)
    if jnp.iscomplexobj(data):
        return data + z.astype(data.dtype)
    if jnp.issubdtype(data.dtype, jnp.floating):
        return data + z.astype(data.dtype)
    return data  # integer streams: rely on the output checksum only


def scan_stage(st, pr, xs):
    """Both the OUTPUT checksum and the INPUT arrays ride the carry:
    the checksum defeats dead-code elimination (a state-only carry lets
    XLA drop the kernel entirely), and carrying the input defeats
    loop-invariant hoisting (with a constant input XLA computes the
    input-dependent part ONCE outside the loop — measured: quadrature
    demod 'ran' in 5.6 us because only the one state-dependent output
    element stayed in the loop)."""
    import dataclasses as _dc

    def body(c, _):
        s, xd, acc = c
        if isinstance(xs, dict):
            xs2 = {k: _dc.replace(v, data=xd[k]) for k, v in xs.items()}
        else:
            xs2 = _dc.replace(xs, data=xd)
        s2, osum = apply_fn(s, pr, xs2)
        osum = osum.astype(jnp.float32)
        if isinstance(xd, dict):
            xd2 = {k: _poison(v, osum) for k, v in xd.items()}
        else:
            xd2 = _poison(xd, osum)
        return (s2, xd2, acc + osum), ()

    xd0 = {k: v.data for k, v in xs.items()} if isinstance(xs, dict) \
        else xs.data
    (st2, _xd, acc), _ = jax.lax.scan(
        body, (st, xd0, jnp.float32(0)), None, length=REPS)
    return st2, acc


def mkprobe(s):
    st, acc = s
    acc = acc + jnp.float32(0)
    for l in jax.tree_util.tree_leaves(st):
        if hasattr(l, "dtype"):
            acc = acc + jnp.sum(jnp.abs(l).astype(jnp.float32))
    return acc


js = jax.jit(scan_stage, donate_argnums=(0,))
probe = jax.jit(mkprobe)

t0 = time.time()
st, xs = init_all()
pr = jax.tree_util.tree_map(jnp.asarray, init_params())
st, acc = js(st, pr, xs)
chk = float(np.asarray(probe((st, acc))))
print(f"# {stage}: compile+warm {time.time()-t0:.1f}s chk={chk:.3g}",
      file=sys.stderr, flush=True)

# fetch RTT
rtts = []
for _ in range(3):
    t0 = time.time()
    _ = float(np.asarray(probe((st, acc))))
    rtts.append(time.time() - t0)
rtt = sorted(rtts)[1]

res = []
for _ in range(5):
    t0 = time.time()
    st, acc = js(st, pr, xs)
    chk = float(np.asarray(probe((st, acc))))
    dt = time.time() - t0
    res.append((dt - rtt) / REPS * 1e6)
res.sort()
us = res[len(res) // 2]
print(f"{stage}: {us:.1f} us/block (min {res[0]:.1f} max {res[-1]:.1f}, "
      f"reps={REPS}, rtt={rtt*1e3:.1f}ms) -> {per_block_samples/us:.0f} "
      f"Msamp/s-equiv", flush=True)
