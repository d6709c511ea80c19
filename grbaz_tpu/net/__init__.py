"""Network plane: BorIP remote-SDR protocol (control + sample planes).

See SURVEY.md L5: UDP sample plane with BorIP headers, TCP typed frames
with serialized tags, text control protocol. The UDP hot path is native
C++ (grbaz_tpu/native/boripnet.cc).
"""
