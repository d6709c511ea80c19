"""RTL2832 demod register-program fidelity.

Asserts the demod core's USB control-transfer wire trace
register-for-register against the reference driver's programs:
init_demod (/root/reference/lib/rtl2832.cc:903-975), set_if
(:977-1015), set_sample_rate (:705-743), the I2C repeater (:746-749),
GPIO read-modify-write (:750-775), endpoint reset (:860-866) and the
VID/PID device table (:111-216).

Wire encoding (reference :563-700):
  system reg write:  wValue=addr,            wIndex=(block<<8)|0x10
  demod reg write:   wValue=(addr<<8)|0x20,  wIndex=0x10|page,
                     each followed by a completion read of page 0x0a
                     reg 0x01
  data bytes big-endian for len==2.
"""

import ctypes

import pytest

from grbaz_tpu.io.rtl_source import RTLSource, TUNER_IDS, _load, wire_log

USBB, SYSB, IICB = 1, 2, 6
USB_SYSCTL, USB_EPA_CTL, USB_EPA_MAXPKT = 0x2000, 0x2148, 0x2158
DEMOD_CTL, GPO, GPOE, GPD, DEMOD_CTL_1 = 0x3000, 0x3001, 0x3003, 0x3004, 0x300b

FIR = [0xca, 0xdc, 0xd7, 0xd8, 0xe0, 0xf2, 0x0e, 0x35, 0x06, 0x50,
       0x9c, 0x0d, 0x71, 0x11, 0x14, 0x71, 0x74, 0x19, 0x41, 0x00]


def W(block, addr, val, ln=1):
    """Expected wire tuple of a system-block register write."""
    if ln == 1:
        return (1, addr, (block << 8) | 0x10, 1, val & 0xFF, 0)
    return (1, addr, (block << 8) | 0x10, 2, (val >> 8) & 0xFF, val & 0xFF)


def DW(page, addr, val, ln=1):
    """Expected wire tuples of a demod-page register write (the write
    plus its completion-handshake read)."""
    if ln == 1:
        wr = (1, (addr << 8) | 0x20, 0x10 | page, 1, val & 0xFF, 0)
    else:
        wr = (1, (addr << 8) | 0x20, 0x10 | page, 2,
              (val >> 8) & 0xFF, val & 0xFF)
    handshake = (0, (0x01 << 8) | 0x20, 0x0a, 1, 0, 0)
    return [wr, handshake]


def expected_set_if(freq_hz):
    """set_if register program (reference :977-1015)."""
    adj = int((freq_hz * (1 << 22)) / 28.8e6 * -1.0) & 0xFFFFFFFF
    ops = []
    ops += DW(1, 0x19, (adj >> 16) & 0x3F)
    ops += DW(1, 0x1A, (adj >> 8) & 0xFF)
    ops += DW(1, 0x1B, adj & 0xFF)
    if freq_hz == 0.0:
        ops += DW(1, 0xB1, 0x1B)   # zero-IF on
        ops += DW(0, 0x08, 0xCD)   # I+Q ADC
        ops += DW(1, 0x15, 0x00)   # no spectrum inversion
    else:
        ops += DW(1, 0xB1, 0x1A)
        ops += DW(0, 0x08, 0x4D)
        ops += DW(1, 0x15, 0x01)
    ops += DW(0, 0x06, 0x80)
    return ops


def expected_init_demod():
    """The complete init_demod wire program (reference :903-975)."""
    ops = []
    ops.append(W(USBB, USB_SYSCTL, 0x09))
    ops.append(W(USBB, USB_EPA_MAXPKT, 0x0002, 2))
    ops.append(W(USBB, USB_EPA_CTL, 0x1002, 2))
    ops.append(W(SYSB, DEMOD_CTL_1, 0x22))
    ops.append(W(SYSB, DEMOD_CTL, 0xE8))
    ops += DW(1, 0x01, 0x14)           # soft reset strobe
    ops += DW(1, 0x01, 0x10)
    ops += DW(1, 0x16, 0x0000, 2)      # spectrum inv / ACR off
    for i in range(6):                 # IF registers cleared
        ops += DW(1, 0x16 + i, 0x00)
    for i, b in enumerate(FIR):        # the 20-byte FIR bank
        ops += DW(1, 0x1C + i, b)
    ops += DW(0, 0x19, 0x05)
    ops += DW(1, 0x93, 0xF0)           # FSM state-holding
    ops += DW(1, 0x94, 0x0F)
    ops += DW(1, 0x11, 0x00)           # en_dagc off
    ops += DW(1, 0x04, 0x00)           # RF/IF AGC loop off
    ops += DW(0, 0x61, 0x60)           # PID filter off
    ops += DW(1, 0xB1, 0x1B)           # zero-IF + DC/IQ estimation
    ops += DW(0, 0x0D, 0x83)           # TP_CK0 clock off
    ops += expected_set_if(0.0)
    return ops


@pytest.fixture(scope="module")
def lib():
    return _load()


def test_init_demod_trace(lib):
    """The init program is write-for-write the reference's."""
    h = lib.rtl_open_sim(25e3, 0.6, 0.0, 1, TUNER_IDS["r820t"])
    assert h
    try:
        got = wire_log(lib, h)
        want = expected_init_demod()
        assert got[:len(want)] == want
        # the op right after init_demod is the repeater-on write that
        # gates the tuner probe (reference probe loop :478-509)
        rep_on = DW(1, 0x01, 0x18)
        assert got[len(want):len(want) + 2] == rep_on
    finally:
        lib.rtl_close(h)


@pytest.mark.parametrize("rate", [1.024e6, 2.048e6, 2.4e6, 3.2e6])
def test_sample_rate_registers(lib, rate):
    """ratio = floor(xtal * 2^22 / rate) & ~3 -> page1 0x9f/0xa1
    (reference :705-743)."""
    h = lib.rtl_open_sim(25e3, 0.6, 0.0, 1, TUNER_IDS["e4k"])
    assert h
    try:
        lib.rtl_wire_log_clear(h)
        assert lib.rtl_set_sample_rate(h, rate) == 0
        got = wire_log(lib, h)
        ratio = (int(28.8e6) * (1 << 22)) // int(rate)
        ratio &= ~3
        want = DW(1, 0x9F, (ratio >> 16) & 0xFFFF, 2) \
            + DW(1, 0xA1, ratio & 0xFFFF, 2)
        assert got[:len(want)] == want
        # the programmed real rate is xtal * 2^22 / ratio
        real = 28.8e6 * (1 << 22) / ratio
        assert abs(lib.rtl_get_sample_rate(h) - real) < 1e-6 * real
    finally:
        lib.rtl_close(h)


def test_set_if_nonzero_branch(lib):
    """A tuner with a non-zero IF (R820T) flips the demod into low-IF:
    spectrum inversion on, I-only ADC (reference :995-1009)."""
    h = lib.rtl_open_sim(25e3, 0.6, 0.0, 1, TUNER_IDS["r820t"])
    assert h
    try:
        lib.rtl_wire_log_clear(h)
        assert lib.rtl_set_frequency(h, 100e6) == 0
        got = wire_log(lib, h)
        # after the tuner's I2C program + repeater writes comes
        # set_if(IF): find the 0xB1 page-1 write and check the low-IF
        # branch values
        b1_writes = [op for op in got
                     if op[0] == 1 and op[1] == (0xB1 << 8) | 0x20
                     and op[2] == 0x11]
        assert b1_writes, "no page-1 0xb1 write after tune"
        assert b1_writes[-1][4] == 0x1A  # zero-IF disabled
        adc = [op for op in got
               if op[0] == 1 and op[1] == (0x08 << 8) | 0x20
               and op[2] == 0x10]
        assert adc and adc[-1][4] == 0x4D  # I-only ADC input
        inv = [op for op in got
               if op[0] == 1 and op[1] == (0x15 << 8) | 0x20
               and op[2] == 0x11]
        assert inv and inv[-1][4] == 0x01  # spectrum inversion on
    finally:
        lib.rtl_close(h)


def test_endpoint_reset_on_start(lib):
    """reset(): EPA_CTL 0x1002 then 0x0000 before streaming
    (reference :860-866)."""
    h = lib.rtl_open_sim(25e3, 0.6, 0.0, 1, TUNER_IDS["e4k"])
    assert h
    try:
        lib.rtl_wire_log_clear(h)
        assert lib.rtl_start(h, 1 << 16) == 0
        got = wire_log(lib, h)
        want = [W(USBB, USB_EPA_CTL, 0x1002, 2),
                W(USBB, USB_EPA_CTL, 0x0000, 2)]
        assert got[:2] == want
    finally:
        lib.rtl_stop(h)
        lib.rtl_close(h)


def test_gpio_rmw(lib):
    """set_gpio_output reads GPD, clears the bit in GPO, sets it in
    GPOE; set_gpio_bit rmws GPO (reference :750-775)."""
    h = lib.rtl_open_sim(25e3, 0.6, 0.0, 1, TUNER_IDS["e4k"])
    assert h
    try:
        lib.rtl_wire_log_clear(h)
        assert lib.rtl_set_gpio_output(h, 3) == 0
        assert lib.rtl_set_gpio_bit(h, 3, 1) == 0
        got = wire_log(lib, h)
        # reads: GPD then GPOE then GPO; writes: GPO (bit cleared),
        # GPOE (bit set), GPO (bit set)
        assert got[0][:3] == (0, GPD, SYSB << 8)
        assert got[1] == W(SYSB, GPO, 0x00)
        assert got[2][:3] == (0, GPOE, SYSB << 8)
        assert got[3] == W(SYSB, GPOE, 0x08)
        assert got[4][:3] == (0, GPO, SYSB << 8)
        assert got[5] == W(SYSB, GPO, 0x08)
    finally:
        lib.rtl_close(h)


def test_device_table_products(lib):
    """VID/PID opens resolve product names + tuner hints from the
    device table (reference :193-216)."""
    # NOXON rev 1 hints fc0013
    src = RTLSource(transport="sim", tuner="", vid=0x0CCD, pid=0x00B3)
    try:
        assert src.product_name() == "Terratec NOXON (rev 1)"
        assert src.tuner_name() == "fc0013"
        assert "Terratec NOXON (rev 1)" in src.name()
    finally:
        src.close()
    # ezcap is the canonical 0x0bda:0x2838
    src = RTLSource(transport="sim", tuner="r820t", vid=0x0BDA, pid=0x2838)
    try:
        assert src.product_name() == "ezcap EzTV"
        assert src.tuner_name() == "r820t"
    finally:
        src.close()


def test_device_table_complete(lib):
    """All 21 reference table rows present with exact identities."""
    n = lib.rtl_device_table_count()
    assert n == 21
    name = ctypes.c_char_p()
    vid = ctypes.c_uint16()
    pid = ctypes.c_uint16()
    hint = ctypes.c_char_p()
    rows = {}
    for i in range(n):
        lib.rtl_device_table_get(i, ctypes.byref(name), ctypes.byref(vid),
                                 ctypes.byref(pid), ctypes.byref(hint))
        rows[(vid.value, pid.value)] = (name.value.decode(),
                                        hint.value.decode())
    assert rows[(0x0BDA, 0x2838)][0] == "ezcap EzTV"
    assert rows[(0x1B80, 0xD395)] == ("Peak", "fc0012")
    assert rows[(0x1D19, 0x1102)] == ("Dexatek Technology (rev 2)",
                                      "fc0013")
    assert rows[(0x185B, 0x0650)][0] == "Compro Videomate U650F"
