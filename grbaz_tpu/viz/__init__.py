"""Visualization by data export.

The reference's L6 is wxPython/SDL GUI windows fed by msgq watcher
threads (python/{facsink,eye,plot_sink,waterfall_sink,static_text,
time_panel,doa_compass_*}.py, lib/baz_sdl_sink_uc.cc). Per the build
plan (SURVEY.md §7 "what NOT to rebuild") the GUI internals are
replaced by export sinks producing the same *data products* — raster
PNGs, trace arrays, CSV — consumable by any modern viewer:

* :class:`~grbaz_tpu.viz.sinks.WaterfallSink`  — waterfall_sink/window + sdl raster
* :class:`~grbaz_tpu.viz.sinks.PlotSink`       — plot_sink/plot_window
* :class:`~grbaz_tpu.viz.sinks.EyeSink`        — eye.py datascope
* :class:`~grbaz_tpu.viz.sinks.DoACompass`     — doa_compass_plotter/control
* :class:`~grbaz_tpu.viz.sinks.StaticText`     — static_text.py
* :class:`~grbaz_tpu.viz.sinks.TimePanel`      — time_panel.py
* :mod:`~grbaz_tpu.viz.export`                 — PNG/CSV writers (no deps)
"""

from grbaz_tpu.viz.export import write_csv, write_image
from grbaz_tpu.viz.sinks import (DoACompass, EyeSink, PlotSink, StaticText,
                                 TimePanel, WaterfallSink)
from grbaz_tpu.viz.traffic import TrafficPane, duid_name

__all__ = ["write_csv", "write_image", "WaterfallSink", "PlotSink",
           "EyeSink", "DoACompass", "StaticText", "TimePanel",
           "TrafficPane", "duid_name"]
