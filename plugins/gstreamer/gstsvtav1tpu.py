"""GStreamer Python element wrapping the svt_av1_tpu encoder.

The reference ships a C element (gstreamer-plugin/gstsvtav1enc.c,
SURVEY.md §2.6); the TPU build's encoder is a Python library, so the
idiomatic GStreamer integration is a gst-python element that runs the
Encoder in-process.  Pipeline example:

    gst-launch-1.0 videotestsrc num-buffers=120 ! video/x-raw,format=I420 \
        ! svtav1tpuenc qp=40 intra-period=63 ! filesink location=out.obu

Install: copy this file into $GST_PLUGIN_PATH/python/ (requires
gst-python; this module import-guards so environments without GStreamer
can still import it for inspection/tests).
"""

from __future__ import annotations

try:  # pragma: no cover - gst not present in the build image
    import gi
    gi.require_version("Gst", "1.0")
    gi.require_version("GstBase", "1.0")
    gi.require_version("GstVideo", "1.0")
    from gi.repository import GObject, Gst, GstBase, GstVideo
    HAVE_GST = True
except Exception:  # pragma: no cover
    HAVE_GST = False


def _make_encoder(width: int, height: int, qp: int, intra_period: int,
                  preset: int):
    """Build the library encoder (shared by the element and its smoke
    test — this part has no GStreamer dependency)."""
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.pipeline.encoder import Encoder
    return Encoder(EncoderConfig(
        width=width, height=height, qp=qp, intra_period=intra_period,
        enc_mode=preset,
        pred_structure=0 if intra_period != -2 else 2,
        recon_output=False))


def _push_i420(enc, data: bytes, width: int, height: int):
    """One I420 buffer -> send_picture; returns drained payloads."""
    import numpy as np
    from svt_av1_tpu.io.yuv import Frame
    ysz = width * height
    csz = ((width + 1) // 2) * ((height + 1) // 2)
    y = np.frombuffer(data, np.uint8, ysz).reshape(height, width)
    u = np.frombuffer(data, np.uint8, csz, ysz).reshape(
        (height + 1) // 2, (width + 1) // 2)
    v = np.frombuffer(data, np.uint8, csz, ysz + csz).reshape(
        (height + 1) // 2, (width + 1) // 2)
    enc.send_picture(Frame(y.copy(), u.copy(), v.copy()))
    out = []
    while True:
        pkt = enc.get_packet()
        if pkt is None:
            return out
        out.append(pkt.payload)


if HAVE_GST:  # pragma: no cover - exercised only under gst-python

    class SvtAv1TpuEnc(GstBase.BaseTransform):
        __gstmetadata__ = ("SVT-AV1-TPU encoder", "Codec/Encoder/Video",
                           "AV1 encoder on TPU (svt_av1_tpu)",
                           "svt_av1_tpu")
        __gsttemplates__ = (
            Gst.PadTemplate.new(
                "sink", Gst.PadDirection.SINK, Gst.PadPresence.ALWAYS,
                Gst.Caps.from_string("video/x-raw,format=I420")),
            Gst.PadTemplate.new(
                "src", Gst.PadDirection.SRC, Gst.PadPresence.ALWAYS,
                Gst.Caps.from_string("video/x-av1")),
        )
        __gproperties__ = {
            "qp": (int, "qp", "quantizer 0-63", 0, 63, 40,
                   GObject.ParamFlags.READWRITE),
            "intra-period": (int, "intra-period", "keyframe interval",
                             -2, 1 << 30, 63,
                             GObject.ParamFlags.READWRITE),
            "preset": (int, "preset", "enc-mode 0-8", 0, 8, 8,
                       GObject.ParamFlags.READWRITE),
        }

        def __init__(self):
            super().__init__()
            self.qp, self.intra_period, self.preset = 40, 63, 8
            self._enc = None
            self._w = self._h = 0

        def do_set_property(self, prop, value):
            setattr(self, prop.name.replace("-", "_"), value)

        def do_get_property(self, prop):
            return getattr(self, prop.name.replace("-", "_"))

        def do_set_caps(self, incaps, outcaps):
            st = incaps.get_structure(0)
            self._w = st.get_value("width")
            self._h = st.get_value("height")
            self._enc = _make_encoder(self._w, self._h, self.qp,
                                      self.intra_period, self.preset)
            return True

        def do_transform(self, inbuf, outbuf):
            ok, info = inbuf.map(Gst.MapFlags.READ)
            assert ok
            try:
                payloads = _push_i420(self._enc, bytes(info.data),
                                      self._w, self._h)
            finally:
                inbuf.unmap(info)
            outbuf.fill(0, b"".join(payloads))
            return Gst.FlowReturn.OK

    GObject.type_register(SvtAv1TpuEnc)
    __gstelementfactory__ = ("svtav1tpuenc", Gst.Rank.NONE, SvtAv1TpuEnc)
