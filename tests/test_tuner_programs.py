"""Register-fidelity tests for the R820T / E4000 tuner programs.

The native drivers (grbaz_tpu/native/tuner_programs.inc) must emit the
same I2C register traffic as the reference driver programs
(/root/reference/lib/rtl2832-tuner_r820t.cc, rtl2832-tuner_e4000.cc).
Expected values here are DOUBLE-ENTRY: computed by independent Python
models of the documented algorithms + hand-transcribed spot values from
the reference tables, then asserted against the actual write log of the
mock I2C transport.
"""

import numpy as np
import pytest

from grbaz_tpu.io.rtl_source import RTLSource

# -- reference constants transcribed by hand (spot checks) ------------------
# R828_iniArry first/last bytes (rtl2832-tuner_r820t.cc:404, CLK_OUT=TRUE)
R820T_INIT_FIRST = 0x83   # reg 0x05
R820T_INIT_LAST = 0xC0    # reg 0x1F
R820T_IF_HZ = 3570e3      # Sys_Sel(DVB_T_6M).IF_KHz
# measured gain tables (:3012)
LNA_STEPS = [0, 9, 13, 40, 38, 13, 31, 22, 26, 31, 26, 14, 19, 5, 35, 13]
MIX_STEPS = [0, 5, 10, 10, 19, 9, 10, 25, 17, 10, 8, 16, 13, 6, 3, -8]


@pytest.fixture()
def r820t():
    d = RTLSource(transport="sim", tuner="r820t", rate=2.048e6)
    yield d
    d.close()


@pytest.fixture()
def e4000():
    d = RTLSource(transport="sim", tuner="e4000", rate=2.048e6)
    yield d
    d.close()


def test_r820t_init_image_written_in_order(r820t):
    log = r820t.i2c_log()
    # first 27 writes are the init image to regs 0x05..0x1F sequentially
    regs = [r for r, _ in log[:27]]
    assert regs == list(range(0x05, 0x20))
    assert log[0] == (0x05, R820T_INIT_FIRST)
    assert log[26] == (0x1F, R820T_INIT_LAST)
    # SetStandard writes follow; VER_NUM lands in reg 0x13 low 6 bits
    ver = [v for r, v in log[27:45] if r == 0x13]
    assert ver and (ver[0] & 0x3F) == 49


def _r820t_pll_model(lo_hz):
    """Independent model of R828_PLL (:1394): returns the PLL register
    values (reg10_divnum_bits, reg14, sdm) and the synthesized LO."""
    ref = 28800  # kHz
    lo_khz = lo_hz // 1000
    mix_div, div_num = 2, 0
    while mix_div <= 64:
        if 1770000 <= lo_khz * mix_div < 3540000:
            d = mix_div
            while d > 2:
                d >>= 1
                div_num += 1
            break
        mix_div <<= 1
    div_num += 1  # VCO fine-tune reads 0 on the mock (< pwr_ref 2)
    vco = lo_hz * mix_div
    nint = vco // 2 // (ref * 1000)
    fra = (vco - 2 * ref * 1000 * nint) // 1000
    if fra < ref // 64:
        fra = 0
    elif fra > ref * 127 // 64:
        fra, nint = 0, nint + 1
    elif ref * 127 // 128 < fra < ref:
        fra = ref * 127 // 128
    elif ref < fra < ref * 129 // 128:
        fra = ref * 129 // 128
    ni, si = (nint - 13) // 4, nint - 4 * ((nint - 13) // 4) - 13
    sdm, nsdm = 0, 2
    while fra > 1:
        if fra > 2 * ref // nsdm:
            sdm += 32768 // (nsdm // 2)
            fra -= 2 * ref // nsdm
            if nsdm >= 0x8000:
                break
        nsdm <<= 1
    lo_actual = 2 * ref * 1000 * (nint + sdm / 65536.0) / mix_div
    return div_num, ni + (si << 6), sdm, lo_actual


@pytest.mark.parametrize("rf_mhz", [50.0, 100.0, 446.0, 600.0, 900.0])
def test_r820t_pll_registers_across_bands(r820t, rf_mhz):
    rf = rf_mhz * 1e6
    r820t.i2c_log(clear=True)
    assert r820t.freq(rf)
    log = r820t.i2c_log()
    writes = {}
    for reg, val in log:  # last write to each reg wins
        writes[reg] = val
    div_num, reg14, sdm, lo_actual = _r820t_pll_model(
        int(rf + R820T_IF_HZ))
    assert (writes[0x10] >> 5) == div_num, "mixer divider bits"
    assert writes[0x14] == reg14, "Nint Ni/Si split"
    assert writes[0x16] == (sdm >> 8) and writes[0x15] == (sdm & 0xFF), \
        "sigma-delta registers"
    assert abs(r820t.actual_lo() - lo_actual) < 1.0
    # synthesized LO within PLL resolution of requested (2*ref/65536/div)
    mix_div = 2 ** (div_num - 1 + 1)  # fine-tune added one
    assert abs(lo_actual - (rf + R820T_IF_HZ)) < 2 * 28.8e6 / 65536 + 450e3 / mix_div


def test_r820t_band_mux_registers(r820t):
    # LO = 100 MHz + 3.57 = 103.57 MHz -> band row [100,110): TF_C 0x34
    r820t.i2c_log(clear=True)
    r820t.freq(100e6)
    tfc = [v for r, v in r820t.i2c_log() if r == 0x1B]
    assert tfc and tfc[0] == 0x34
    # LO = 653.57 MHz -> [650, inf): TF_C 0x00, rf_mux bypass 0x40
    r820t.i2c_log(clear=True)
    r820t.freq(650e6)
    log = r820t.i2c_log()
    tfc = [v for r, v in log if r == 0x1B]
    mux = [v for r, v in log if r == 0x1A]
    assert tfc and tfc[0] == 0x00
    assert mux and (mux[0] & 0xC3) == 0x40


def test_r820t_gain_walk_matches_measured_tables(r820t):
    r820t.set_gain_mode(True)
    for want_db in (5.0, 20.0, 33.5, 48.0):
        # independent walk of the measured tables
        want = int(want_db * 10)
        total, lna, mix = 0, 0, 0
        for _ in range(15):
            if total >= want:
                break
            lna += 1
            total += LNA_STEPS[lna]
            if total >= want:
                break
            mix += 1
            total += MIX_STEPS[mix]
        r820t.i2c_log(clear=True)
        assert r820t.gain(want_db)
        log = r820t.i2c_log()
        g5 = [v for r, v in log if r == 0x05]
        g7 = [v for r, v in log if r == 0x07]
        assert g5 and (g5[-1] & 0x0F) == lna, want_db
        assert g7 and (g7[-1] & 0x0F) == mix, want_db


def test_e4000_init_script(e4000):
    log = e4000.i2c_log()
    # tunerreset: reg 0x02=64 twice, 0x09=0, 0x05=0, 0x00=7
    assert log[0] == (0x02, 64) and log[1] == (0x02, 64)
    assert log[2] == (0x09, 0) and log[3] == (0x05, 0) and log[4] == (0x00, 7)
    # Tunerclock: 0x06=0, 0x7A=150
    assert log[5] == (0x06, 0) and log[6] == (0x7A, 150)
    # Qpeak: 0x7E=1, 0x7F=254, 0x82=0, 0x24=5, 0x87=32, 0x88=1
    assert log[7:13] == [(0x7E, 1), (0x7F, 254), (0x82, 0), (0x24, 5),
                         (0x87, 32), (0x88, 1)]
    # GainControlinit starts with AGC reg 0x1A=23
    assert (0x1A, 23) in log[13:16]


@pytest.mark.parametrize("rf_mhz,reg0d,mult", [
    (70.0, 15, 48),    # <=72.4 MHz band
    (100.0, 13, 32),   # <=108.3
    (300.0, 10, 12),   # <=325
    (600.0, 2, 6),     # <=667
    (1400.0, 0, 2),    # top band
])
def test_e4000_pll_band_table(e4000, rf_mhz, reg0d, mult):
    khz = int(rf_mhz * 1000)
    e4000.i2c_log(clear=True)
    assert e4000.freq(rf_mhz * 1e6)
    writes = dict(e4000.i2c_log())
    assert writes[0x0D] == reg0d
    # sigma-delta divider model (reference PLL())
    ref = 28800
    vco = khz * mult
    divider = vco // ref
    sigdel = 65536 * (vco - divider * ref) // ref
    sigdel = max(sigdel, 1024)
    sigdel = min(sigdel, 64512)
    assert writes[0x09] == divider & 0xFF
    assert writes[0x0A] == sigdel & 0xFF
    assert writes[0x0B] == sigdel >> 8
    if khz <= 1000000:
        assert writes[0x78] == 3      # freqband low/mid
    else:
        assert writes[0x78] == 0 and writes[0x07] == 7


def test_e4000_gain_map(e4000):
    e4000.set_gain_mode(True)
    e4000.i2c_log(clear=True)
    assert e4000.gain(12.5)
    writes = [v for r, v in e4000.i2c_log() if r == 0x14]
    # _mapGainsE4000: 12.5 dB (125 tenth) -> register value 9
    assert writes and (writes[-1] & 0x0F) == 9
    assert e4000.gain() == pytest.approx(12.5)


def test_e4000_if_filter_registers(e4000):
    # IFfilter: 8 MHz bandwidth -> IF_BW 4000 kHz row (reference chain)
    import ctypes
    # bandwidth isn't on the public Device surface yet: drive via freq;
    # instead assert the DC-offset LUT ran at set_frequency (regs
    # 0x60/0x50 + 0x61/0x51 + 0x63/0x53 + 0x62/0x52 written)
    e4000.i2c_log(clear=True)
    e4000.freq(300e6)
    regs = {r for r, _ in e4000.i2c_log()}
    for expect in (0x60, 0x50, 0x61, 0x51, 0x63, 0x53, 0x62, 0x52):
        assert expect in regs, hex(expect)


def _fc_pll_model(khz, bands, xtal_khz=28800):
    """Independent FC0012/13 coarse+fine divider model."""
    multi = r5 = r6 = None
    for m, b5, b6 in bands:
        if khz * m < 3560000:
            multi, r5, r6 = m, b5, b6
            break
    dvco = khz * multi
    r6 |= 0x08
    half = xtal_khz // 2
    xdiv = dvco // half
    if dvco - xdiv * half >= half // 2:
        xdiv += 1
    pm, am = xdiv // 8, xdiv % 8
    r1, r2 = (am + 8, pm - 1) if am < 2 else (am, pm)
    xin = ((dvco - (dvco // half) * half) << 15) // half
    if xin >= 16384:
        xin += 32768
    return multi, r1, r2, (xin >> 8) & 0xFF, xin & 0xFF, r5, ~0xC0 & r6


FC0012_BANDS = [(96, 0x82, 0x00), (64, 0x82, 0x02), (48, 0x42, 0x00),
                (32, 0x42, 0x02), (24, 0x22, 0x00), (16, 0x22, 0x02),
                (12, 0x12, 0x00), (8, 0x12, 0x02), (6, 0x0A, 0x00),
                (4, 0x0A, 0x02)]


@pytest.mark.parametrize("rf_mhz", [64.0, 180.0, 300.0, 600.0, 880.0])
def test_fc0012_pll_registers(rf_mhz):
    d = RTLSource(transport="sim", tuner="fc0012", rate=2.048e6)
    try:
        d.i2c_log(clear=True)
        assert d.freq(rf_mhz * 1e6)
        writes = dict(d.i2c_log())
        multi, r1, r2, r3, r4, r5, r6 = _fc_pll_model(int(rf_mhz * 1000),
                                                      FC0012_BANDS)
        assert writes[0x01] == r1 and writes[0x02] == r2
        assert writes[0x03] == r3 and writes[0x04] == r4
        assert writes[0x05] == r5 and writes[0x06] == r6
        # VCO cal strobe sequence present
        log = d.i2c_log()
        evals = [v for r, v in log if r == 0x0E]
        assert evals[:3] == [0x80, 0x00, 0x00]
        assert abs(d.actual_lo() - rf_mhz * 1e6) < 28.8e6 / 2 / 32768 + 1
    finally:
        d.close()


def test_fc0012_init_write_list():
    d = RTLSource(transport="sim", tuner="fc0012", rate=2.048e6)
    try:
        log = d.i2c_log()
        # FC0012_Open list starts 0x01=0x05 ... and ends with the
        # nim_rtl2832 re-writes (0x0D, 0x11, 0x15)
        assert log[0] == (0x01, 0x05) and log[1] == (0x02, 0x10)
        assert (0x12, 0x1F) in log[:20]         # max gain
        assert log[20:23] == [(0x0D, 0x02), (0x11, 0x00), (0x15, 0x04)]
    finally:
        d.close()


def test_fc0013_band_switch_and_gain():
    d = RTLSource(transport="sim", tuner="fc0013", rate=2.048e6)
    try:
        # VHF: tracking filter bits on reg 0x1D, reg 0x07 bit4 set
        d.i2c_log(clear=True)
        d.freq(180e6)
        log = d.i2c_log()
        r1d = [v for r, v in log if r == 0x1D]
        assert r1d and (r1d[0] & 0x1C) == 0x1C     # entry write
        assert any((v & 0x1C) == 0x18 for v in r1d)  # 177.5-184.5 band
        assert any(r == 0x07 and (v & 0x10) for r, v in log)
        # UHF: reg 0x14 gains band bits 0x40
        d.i2c_log(clear=True)
        d.freq(600e6)
        log = d.i2c_log()
        assert any(r == 0x14 and (v & 0x60) == 0x40 for r, v in log)
        # gain map: 19.1 dB -> code 0x11 in reg 0x14 bits [4:0]
        d.set_gain_mode(True)
        d.i2c_log(clear=True)
        d.gain(19.1)
        g = [v for r, v in d.i2c_log() if r == 0x14]
        assert g and (g[-1] & 0x1F) == 0x11
    finally:
        d.close()


# -- E4K (osmocom-lineage) program ------------------------------------------

def _e4k_pll_model(flo_hz, fosc=28800000):
    """Independent model of e4k_compute_pll_params (reference
    rtl2832-tuner_e4k.cc:1175): R-divider table walk, Fvco window,
    Z/X split."""
    three_ph = 1 if flo_hz < 300e6 else 0
    for i, r0 in enumerate([4, 8, 12, 16, 24, 32, 40, 48]):
        r = r0 if three_ph else r0 // 2
        fvco = int(flo_hz) * r
        if not (2.6e9 <= fvco <= 3.9e9):
            continue
        z = fvco // fosc
        if z > 255:
            continue
        x = ((fvco - fosc * z) * 65536) // fosc
        flo_act = (fosc * z + (fosc * x) // 65536) // r
        return i, three_ph, z, x, flo_act
    raise AssertionError("no PLL solution")


@pytest.fixture()
def e4k():
    d = RTLSource(transport="sim", tuner="e4k", rate=2.048e6)
    yield d
    d.close()


def test_e4k_init_register_trace(e4k):
    log = e4k.i2c_log()
    # reset + clock config (e4k_init:1557-1567)
    assert log[0] == (0x00, 0x07)          # MASTER1 RESET|NORM_STBY|POR_DET
    assert log[1] == (0x05, 0x00) and log[2] == (0x06, 0x00)
    assert log[3] == (0x7A, 0x96)          # CLKOUT_PWDN
    # magic_init values (:1526-1536)
    assert log[4:12] == [(0x7E, 1), (0x7F, 0xFE), (0x82, 0), (0x86, 0x50),
                         (0x87, 0x20), (0x88, 1), (0x9F, 0x7F), (0xA0, 7)]
    assert (0x2F, 4) in log                # common mode 850 mV
    # DC offset LUT generation wrote all 8 table registers
    regs = {r for r, _ in log}
    for lut in (0x50, 0x51, 0x52, 0x53, 0x60, 0x61, 0x62, 0x63):
        assert lut in regs, hex(lut)
    # AGC thresholds + narrowest IF filters (MIX idx15<<4 | RC idx15,
    # CHAN idx31 then bandwidth 8 MHz -> idx 0)
    assert (0x1D, 0x10) in log and (0x1E, 0x04) in log and (0x1F, 0x1A) in log
    f2 = [v for r, v in log if r == 0x11]
    assert f2[-1] == 0xFF
    f3 = [v for r, v in log if r == 0x12]
    assert f3[0] == 0x1F and f3[-1] == 0x00
    # moderate IF gain programming left GAIN3 = stages (1,1,1,1) fields
    g3 = [v for r, v in log if r == 0x16]
    assert g3[-1] == 0x2B and g3[-2] == 0x4B
    g4 = [v for r, v in log if r == 0x17]
    assert g4[-1] == 0x12


@pytest.mark.parametrize("rf_mhz", [70.0, 100.0, 300.0, 600.0, 1400.0])
def test_e4k_pll_registers_across_bands(e4k, rf_mhz):
    flo = rf_mhz * 1e6
    e4k.i2c_log(clear=True)
    assert e4k.freq(flo)
    writes = dict(e4k.i2c_log())
    r_idx, three_ph, z, x, flo_act = _e4k_pll_model(flo)
    assert writes[0x0D] == (r_idx & 7) | (three_ph << 3), "SYNTH7 R/phase"
    assert writes[0x09] == z, "SYNTH3 Z"
    assert writes[0x0A] == x & 0xFF and writes[0x0B] == x >> 8, "SYNTH4/5 X"
    # band select: BIAS 3 except L band 0 (e4k_band_set:1116)
    assert writes[0x78] == (0 if flo_act >= 1135e6 else 3)
    assert e4k.freq() == pytest.approx(flo_act, abs=1.0)
    # PLL resolution bound
    assert abs(e4k.actual_lo() - flo) < 28.8e6 / 65536 + 1


def test_e4k_band_field_and_rf_filter(e4k):
    # 600 MHz: UHF band -> SYNTH1 field 2<<1, RF filter idx 9 (615 MHz
    # nearest center in rf_filt_center_uhf, :807)
    e4k.i2c_log(clear=True)
    e4k.freq(600e6)
    writes = dict(e4k.i2c_log())
    assert writes[0x07] & 0x06 == 0x04
    assert writes[0x10] & 0x0F == 9
    # 1400 MHz: L band -> field 3<<1, filter idx 3 (1410 MHz nearest)
    e4k.i2c_log(clear=True)
    e4k.freq(1400e6)
    writes = dict(e4k.i2c_log())
    assert writes[0x07] & 0x06 == 0x06
    assert writes[0x10] & 0x0F == 3
    assert writes[0x78] == 0  # L-band BIAS


def test_e4k_gain_map_floor_snap(e4k):
    e4k.set_gain_mode(True)
    # exact entry: 12.5 dB -> LNA field 9 (map e4k.cc:201)
    e4k.i2c_log(clear=True)
    assert e4k.gain(12.5)
    g = [v for r, v in e4k.i2c_log() if r == 0x14]
    assert g and (g[-1] & 0x0F) == 9
    assert e4k.gain() == pytest.approx(12.5)
    # floor snap: 0.3 dB -> 0.0 dB entry (field 4), get_map_index
    # semantics (rtl2832.cc:66)
    e4k.i2c_log(clear=True)
    assert e4k.gain(0.3)
    g = [v for r, v in e4k.i2c_log() if r == 0x14]
    assert g and (g[-1] & 0x0F) == 4
    assert e4k.gain() == pytest.approx(0.0)
    # below the table -> FAILURE, no write (wrapper returns FAILURE)
    e4k.i2c_log(clear=True)
    assert not e4k.gain(-6.0)
    assert not [v for r, v in e4k.i2c_log() if r == 0x14]
