"""Verify drive: fused WBFM chain via StreamExecutor (CPU or TPU)."""
import sys
sys.path.insert(0, "/root/repo")
import os
if os.environ.get("FORCE_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")
import numpy as np

from grbaz_tpu.core.executor import InputSpec, StreamExecutor
from grbaz_tpu.models.wbfm import WBFMConfig, WBFMFrontend, build_wbfm

fs = 3.2e6
block = 1 << 17
cfg = WBFMConfig(sample_rate=fs, center_freq=250e3, block_size=block)
fg, handles = build_wbfm(cfg)
assert type(handles["channel"]).__name__ == "WBFMFrontend", "fused path not active"
ex = StreamExecutor(fg, {"iq": InputSpec((block,), "complex64", fs)})

# FM station at +250 kHz: 1 kHz tone, 75 kHz deviation
n = block * 4
t = np.arange(n)
msg = np.sin(2 * np.pi * 1e3 / fs * t)
iq = np.exp(1j * 2 * np.pi * ((250e3 / fs) * t + 75e3 / fs * np.cumsum(msg) / fs * fs / fs))
iq = np.exp(1j * (2 * np.pi * 250e3 / fs * t
                  + 2 * np.pi * 75e3 * np.cumsum(msg) / fs)).astype(np.complex64)

audio = []
for b in range(4):
    r = ex.step({"iq": iq[b * block:(b + 1) * block]})
    d, c = r["audio"]
    audio.append(d[:c])
a = np.concatenate(audio)[2048:]
spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
freqs = np.fft.rfftfreq(len(a), 1.0 / cfg.audio_rate)
peak = freqs[np.argmax(spec)]
k = np.argmax(spec)
sig = np.sum(spec[max(0, k - 4):k + 5] ** 2)
sinad = 10 * np.log10(sig / max(np.sum(spec ** 2) - sig, 1e-30))
print(f"tone: {peak:.1f} Hz  SINAD: {sinad:.1f} dB", flush=True)
assert abs(peak - 1000) < 10 and sinad > 30

# runtime retune: move the station off-tune -> signal collapses
ex.params[handles["channel"].name].update(
    WBFMFrontend.freq_params(1.2e6, fs))
r = ex.step({"iq": iq[:block]})
d, c = r["audio"]
p_off = float(np.mean(np.asarray(d[:c])[512:] ** 2))
ex.params[handles["channel"].name].update(
    WBFMFrontend.freq_params(250e3, fs))
r = ex.step({"iq": iq[:block]})
# partial final block via counts
r2 = ex.step({"iq": iq[:block]}, counts={"iq": block // 2})
d2, c2 = r2["audio"]
print(f"off-tune audio power {p_off:.3f}; partial-block count {c2} "
      f"(cap {len(d2)})", flush=True)
assert c2 < len(d2)
print("DRIVE OK", flush=True)
