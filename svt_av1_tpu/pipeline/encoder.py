"""Public encoder API.

Mirrors the reference's 12-entry-point lifecycle (EbSvtAv1Enc.h:421-507):
init handle -> set parameter -> init encoder -> send pictures -> get
packets -> deinit.  The TPU build exposes the same lifecycle as an
``Encoder`` class plus functional aliases with the reference's names.

Dataflow per frame (replaces the reference's 15-thread pipeline):
  host pad/block  ->  device wavefront encode (intra_encoder)  ->
  host entropy tile (pipeline.tile)  ->  OBU packetization (entropy.obu)
"""

from __future__ import annotations

import dataclasses
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.entropy import obu as O
from svt_av1_tpu.entropy.cdf_model import FrameContext
from svt_av1_tpu.io.yuv import Frame
from svt_av1_tpu.pipeline import inter_encoder as PE
from svt_av1_tpu.pipeline import intra_encoder as IE
from svt_av1_tpu.pipeline.tile import TileWriter


@dataclasses.dataclass
class Packet:
    """Output bitstream buffer (ref EbBufferHeaderType)."""
    payload: bytes
    pts: int
    is_keyframe: bool
    recon: Optional[Frame] = None
    psnr: Optional[tuple] = None
    # hier-B: coded no-show TUs have show=False (display comes later via
    # a show_existing TU); display_idx is the display-order position of
    # the picture this TU codes or shows (None for flat modes)
    show: bool = True
    display_idx: Optional[int] = None
    # the ACTUALLY dispatched frame qindex (incl. layer/AQ offsets and
    # clipping) — RC feedback fits its bit models against this, not a
    # re-derivation (which drifts once the next span re-plans base q)
    qindex: Optional[int] = None


class Encoder:
    """ref eb_init_handle + eb_svt_enc_set_parameter + eb_init_encoder."""

    def __init__(self, config: EncoderConfig) -> None:
        config.validate()
        self.cfg = config
        # hier-B random access needs order hints for ref list semantics
        # and the skip-mode gate (ref Av1GenerateRpsInfo order hints)
        self._hier = (config.pred_structure == 2
                      and not config.intra_only)
        # low-delay B: every frame references the previous frame (LAST)
        # and the keyframe anchor (GOLDEN) — both forward, shown in order
        # (ref EB_PRED_LOW_DELAY_B flat structure)
        self._ldb = (config.pred_structure == 1
                     and not config.intra_only)
        self.seq = O.SequenceParams(
            config.width, config.height, config.bit_depth, config.sb_size,
            enable_cdef=config.enable_cdef, enable_order_hint=self._hier,
            film_grain_present=bool(config.enable_film_grain),
            enable_restoration=config.enable_restoration,
            enable_warped_motion=config.enable_warped_motion,
            screen_content=bool(config.screen_content_mode))
        # screen content (intra block copy): hash-ME DV maps are decided
        # per keyframe ahead of the wavefront (pipeline/ibc.py); mode 2
        # auto-detects from the first source frame (ref sc detection,
        # EbPictureDecisionProcess.c:650)
        self._sc_mode = config.screen_content_mode
        self._sc_auto = None
        self._ibc_by_idx: dict = {}
        # warped motion (WARPED_CAUSAL): host post-pass over the P-step
        # outputs (pipeline/warp_pass.py) — derives per-block affine
        # models from the final motion field exactly like the decoder
        self._warp = config.enable_warped_motion
        self._ref_host = None     # true-dim host recon (warp reference)
        # preset signal derivation (ref signal_derivation_enc_dec_kernel_oq,
        # EbEncDecProcess.c:1229): presets 0-7 run the full-RD partition
        # merge; preset 8 keeps the fast SAD merge
        from svt_av1_tpu.utils.trace import global_tracer
        self._tracer = global_tracer()   # SVT_TRACE=<path> enables
        self._rdo = config.enc_mode <= 7
        # multi-reference prediction (3-slot ref lists on hier-B
        # interior frames; config.multi_ref, -1 = preset auto)
        self._mrp = (bool(config.multi_ref) if config.multi_ref >= 0
                     else config.enc_mode <= 7)
        # presets <= 5 additionally search the inter tx-type set
        self._txs = config.enc_mode <= 5
        # presets <= 5 add rectangular partitions (PARTITION_HORZ/VERT
        # at the 16/32 nodes) to the inter RD merge
        self._rect = config.enc_mode <= 5
        # frame-level interpolation filter: forced by config, or decided
        # once per stream from open-loop stats of the first inter source
        # (analysis.pick_interp_filter); the decision is host-static
        # because each filter compiles its own inter step
        self._interp_filt = (config.interp_filter
                             if config.interp_filter >= 0 else None)
        # global motion (TRANSLATION, IPPP chains): open-loop per-frame
        # estimate between consecutive sources; coded in the header and
        # injected as a GLOBALMV candidate in the P step
        self._gm_enab = (config.enable_global_motion
                         and config.pred_structure == 0)
        self._gm_prev_src = None
        self._gm_by_idx = {}      # coded (send) idx -> {ref: (r8, c8)}
        self._grain = None
        if config.enable_film_grain > 0:
            from svt_av1_tpu.ops.film_grain import preset_params
            self._grain = preset_params(int(config.enable_film_grain))
        # enable_film_grain == -1: estimated from the first source frame
        # (ref noise_model.c flat-block noise fit) in _send_inner
        self._frame_idx = 0
        self._send_idx = 0
        self._packets: list[Packet] = []
        self._pending: list = []   # dispatched device batches
        # inter-frame entropy pipeline: frames are entropy-independent
        # (each carries a fresh FrameContext), so fetch + tile coding of
        # MANY in-flight frames run concurrently on host threads while
        # the device encodes ahead — the TPU analog of the reference's
        # pooled EntropyCoding processes (EbEncHandle.c:561-585 spawns
        # up to 3 EC threads; here the C coder releases the GIL so the
        # pool truly overlaps fetch, coding and device compute).
        # get_packet() preserves decode order by waiting on the head
        # future only.  Worker count scales with host cores but keeps a
        # floor of 2 even on 1-core hosts: one worker blocks in
        # device_get (pure I/O wait on the link) while the other runs
        # the C coder — more would only thrash the GIL on the
        # Python-side stitching.
        import os
        self._ec_pool = ThreadPoolExecutor(
            max_workers=max(2, min(6, (os.cpu_count() or 1))))
        self._inbox: list[Frame] = []  # frames awaiting dispatch
        self._ref_dev = None       # device recon planes of the last frame
        if self._hier:
            self._store: dict = {}         # disp -> {dev, slot, pins}
            self._free_slots = list(range(8))
            self._anchor: Optional[int] = None
            self._buf: list = []           # (disp, Frame) since anchor
            self._gop_n = 1 << config.hierarchical_levels
        # lookahead (flat/low-delay structures; hier-B's mini-GOP buffer
        # already provides its reordering window)
        self._la = None
        if (config.look_ahead_distance > 0 and not config.intra_only
                and not self._hier):
            from svt_av1_tpu.pipeline.lookahead import Lookahead
            self._la = Lookahead(config.look_ahead_distance)
        self._rc = None
        if config.rate_control_mode != 0:
            from svt_av1_tpu.pipeline.rate_control import (
                GopRateController, ModelRateController, RateController)
            fps = config.frame_rate_num / max(config.frame_rate_den, 1)
            if config.rate_control_mode == 1:
                self._rc = ModelRateController(
                    config.target_bit_rate, fps, config.min_qp_allowed,
                    config.max_qp_allowed)
            elif self._hier:
                # hier-B VBR/CVBR: whole-mini-GOP planning with
                # per-layer bit models (RC v2; ref per-GOP parallel RC
                # state, EbRateControlProcess.c:3895-3901)
                self._rc = GopRateController(
                    config.target_bit_rate, fps, config.min_qp_allowed,
                    config.max_qp_allowed,
                    constrained=config.rate_control_mode == 3)
            else:
                self._rc = RateController(
                    config.target_bit_rate, fps, config.min_qp_allowed,
                    config.max_qp_allowed,
                    constrained=config.rate_control_mode == 3)

    def push_qp(self, qp: Optional[int]) -> None:
        """Queue a per-frame QP override, consumed in coding order (ref
        use_qp_file / SendQpOnTheFly, EbAppProcessCmd.c:925).  None keeps
        the configured/RC-chosen q for that frame."""
        if not hasattr(self, "_qp_queue"):
            self._qp_queue: list = []
        self._qp_queue.append(qp)

    def _aq_offset(self, frame: Frame, stats=None) -> int:
        """Frame-level adaptive quantization from picture analysis (ref
        SourceBasedOperations QP scaling; pipeline/analysis.py).
        stats: pre-computed PictureStats (the per-SB variance pass costs
        real host time at 1080p — callers that also need the per-SB
        qmap analyze once and share)."""
        if not self.cfg.enable_adaptive_quantization:
            return 0
        from svt_av1_tpu.pipeline.analysis import analyze, aq_frame_offset
        return aq_frame_offset(stats if stats is not None
                               else analyze(frame.y), self.cfg.bit_depth)

    def _frame_qindex(self, is_key: bool) -> int:
        q = getattr(self, "_qp_queue", None)
        if q:
            override = q.pop(0)
            if override is not None:
                return _qp_to_qindex(int(override))
        if self._rc is not None:
            return self._rc.frame_qindex(is_key)
        return _qp_to_qindex(self.cfg.qp)

    def _is_key(self, idx: int) -> bool:
        p = self.cfg.intra_period
        if p == -2:
            return True
        if p == -1:
            return idx == 0
        return idx % (p + 1) == 0

    def _scene_cut(self, frame: Frame) -> bool:
        """Histogram/SAD scene-change detector on a 1/8-scale luma
        (ref picture_decision_kernel scene-change windows,
        EbPictureDecisionProcess.c:109-270, reduced to a running
        mean-abs-difference test)."""
        if not self.cfg.scene_change_detection:
            return False
        small = frame.y[::8, ::8].astype(np.int32)
        prev = getattr(self, "_scd_prev", None)
        self._scd_prev = small
        if prev is None or prev.shape != small.shape:
            return False
        mad = float(np.abs(small - prev).mean())
        avg = getattr(self, "_scd_avg", None)
        self._scd_avg = mad if avg is None else 0.75 * avg + 0.25 * mad
        if avg is None:
            return mad > 40.0
        return mad > max(25.0, 4.0 * avg)

    # -- checkpoint / resume (SURVEY §5: GOP-boundary resume is free by
    # design — references never cross a keyframe) -------------------------------
    def checkpoint(self) -> dict:
        """Snapshot the encoder's stream state.  Take it when no work is
        in flight (all packets drained); resuming restarts at the next
        GOP boundary — if the resume point is mid-GOP the first frame is
        coded as a keyframe, keeping the stream decodable."""
        assert not self._pending and not self._inbox and not self._packets, \
            "drain packets before checkpointing"
        assert not (self._hier and self._buf), "flush the mini-GOP first"
        st = {"send_idx": self._send_idx, "frame_idx": self._frame_idx,
              "scd_avg": getattr(self, "_scd_avg", None)}
        if self._rc is not None:
            st["rc"] = {"fullness": self._rc.fullness, "qi": self._rc.qi,
                        "boot": self._rc._bootstrapped}
        return st

    def restore(self, st: dict) -> None:
        """Resume from a checkpoint() snapshot (e.g. in a fresh process
        after a host loss — the elastic-recovery unit is the GOP)."""
        self._send_idx = st["send_idx"]
        self._frame_idx = st["frame_idx"]
        if st.get("scd_avg") is not None:
            self._scd_avg = st["scd_avg"]
        self._scd_prev = None
        self._ref_dev = None           # forces an intra/key restart point
        if self._hier:
            self._store = {}
            self._free_slots = list(range(8))
            self._anchor = None
            self._buf = []
        if "rc" in st and self._rc is not None:
            self._rc.fullness = st["rc"]["fullness"]
            self._rc.qi = st["rc"]["qi"]
            self._rc._bootstrapped = st["rc"]["boot"]

    # -- ref eb_svt_enc_stream_header ------------------------------------------
    def stream_header(self) -> bytes:
        return O.write_sequence_header(self.seq)

    # -- ref eb_svt_enc_send_picture ---------------------------------------------
    def send_picture(self, frame: Optional[Frame]) -> None:
        """Queues the picture: device work is dispatched asynchronously and
        completes while the host entropy-codes earlier frames (the
        reference's pipelined-stages behavior; packets come from
        get_packet, which may block — EbSvtAv1Enc.h eb_svt_get_packet).
        send_picture(None) signals end-of-stream (the reference's EOS
        buffer flag) and flushes any buffered mini-GOP."""
        if frame is None:
            self.flush()
            return
        with self._tracer.span("dispatch", self._send_idx):
            self._send_inner(frame)

    def _send_inner(self, frame: Frame) -> None:
        if self.cfg.enable_film_grain == -1 and self._grain is None:
            from svt_av1_tpu.ops.film_grain import estimate_params
            # scaling points live in the 8-bit domain (spec 5.9.30):
            # normalize 10-bit sources before the flat-block noise fit
            ey = frame.y if self.cfg.bit_depth == 8 else np.clip(
                (frame.y.astype(np.int32) + 2) >> 2, 0, 255).astype(
                    np.uint8)
            self._grain = estimate_params(ey)
        if self.cfg.intra_only:
            if self._sc_active(frame):
                # screen content: per-frame dispatch (hash-ME DV maps
                # differ per frame; the batch path has no IBC lane)
                qindex = self._frame_qindex(True)
                out, deb, _pl, nbh, nbw = self._intra_dispatch(frame,
                                                               qindex)
                self._enqueue_key(frame, out, deb, None, qindex, nbh,
                                  nbw)
                return
            self._inbox.append(frame)
            if len(self._inbox) >= max(1, self.cfg.device_batch):
                self._dispatch_inbox()
        elif self._hier:
            self._hier_send(frame)
        elif self._la is not None:
            for f, q_off in self._la.push(frame):
                self._send_flat(f, q_off)
        else:
            self._send_flat(frame, 0)

    def _send_flat(self, frame: Frame, q_off: int) -> None:
        if self._ldb:
            self._ldb_send(frame, q_off)
        else:
            self._dispatch_one(frame, q_off)

    def flush(self) -> None:
        """End-of-stream: code any buffered partial mini-GOP (truncated
        dyadic structure, like the reference's incomplete mini-GOP
        handling in picture decision) and drain the lookahead window."""
        if self._hier and self._buf:
            self._dispatch_span()
        if self._la is not None:
            for f, q_off in self._la.flush():
                self._send_flat(f, q_off)

    # -- hierarchical-B scheduling (ref picture_decision_kernel) ---------------
    def _hier_send(self, frame: Frame) -> None:
        d = self._send_idx
        self._send_idx += 1
        if self._anchor is None or self._is_key(d):
            self._dispatch_span()          # truncated GOP before the key
            self._code_key_anchor(d, frame)
        else:
            self._buf.append((d, frame))
            if len(self._buf) >= self._gop_n:
                self._dispatch_span()

    def _hint(self, disp: int) -> int:
        return disp & ((1 << self.seq.order_hint_bits) - 1)

    def _unpin(self, disp: int) -> None:
        e = self._store[disp]
        e["pins"] -= 1
        if e["pins"] <= 0:
            if e["slot"] is not None:
                self._free_slots.append(e["slot"])
            del self._store[disp]

    def _code_key_anchor(self, disp: int, frame: Frame) -> None:
        """Shown keyframe: decoder-side it refreshes every slot, so the
        encoder's slot book restarts with the keyframe in slot 0."""
        qindex = self._frame_qindex(True)
        out, deb, planes, nbh, nbw = self._intra_dispatch(frame, qindex)
        meta = {"display": disp, "show": True,
                "order_hint": self._hint(disp)}
        if self.cfg.enable_restoration and deb is not None:
            lr, pl, planes = self._lr_from_dev(frame, deb[:3], deb[4:7])
            meta.update(lr=lr, lr_planes=tuple(pl))
        self._store = {disp: {"dev": planes, "slot": 0, "pins": 1}}
        self._free_slots = list(range(1, 8))
        self._anchor = disp
        self._enqueue_key(frame, out, deb, meta, qindex, nbh, nbw)

    def _dispatch_span(self) -> None:
        """Code the buffered span (lo, hi] in dyadic decode order and
        interleave show_existing emission (pipeline.gop.plan_minigop)."""
        if not self._buf:
            return
        from svt_av1_tpu.pipeline.gop import (CodeStep, layer_qindex,
                                              plan_minigop, plan_pins)
        lo = self._anchor
        hi = self._buf[-1][0]
        frames = dict(self._buf)
        self._buf = []
        steps = plan_minigop(lo, hi)
        if self._rc is not None:
            # absorb feedback from already-finished packets before
            # planning (burst senders outrun the entropy stage; ref RC
            # consumes whatever feedback tasks have arrived)
            while self._pending:
                e = self._pending[0]
                if e[0] == "se" or (e[0] == "pf" and e[1].done()):
                    self._finish_one()
                else:
                    break
        if self._rc is not None and hasattr(self._rc, "plan_span"):
            # RC v2: hand the span's layers + lookahead complexities
            # (consecutive-source MADs over the buffered mini-GOP — the
            # buffer IS the lookahead window) to the GOP planner
            layers = [s.layer for s in steps if isinstance(s, CodeStep)]
            mads, prev = [], None
            for d in sorted(frames):
                y = frames[d].y
                if prev is not None:
                    mads.append(float(np.mean(np.abs(
                        y.astype(np.int16) - prev.astype(np.int16)))))
                prev = y
            self._rc.plan_span(layers, mads)
        pins = plan_pins(steps, lo)
        pins[hi] = pins.get(hi, 0) + 1     # hi becomes the next anchor
        pending_pins = {}
        for d, n in pins.items():
            if d in self._store:
                self._store[d]["pins"] += n
            else:
                pending_pins[d] = n
        self._unpin(lo)                    # release the old anchor pin
        aq2 = int(self.cfg.enable_adaptive_quantization) >= 2
        for step in steps:
            if isinstance(step, CodeStep):
                stats = None
                if self.cfg.enable_adaptive_quantization:
                    # ONE variance pass per frame, shared by the frame
                    # offset and the per-SB qmap (advisor: analyze ran
                    # twice per frame at 1080p); chroma planes enable
                    # the grass/skin/dark classifiers in the qmap
                    from svt_av1_tpu.pipeline.analysis import analyze
                    f_ = frames[step.disp]
                    stats = analyze(f_.y, f_.u, f_.v, self.cfg.bit_depth)
                base_q = self._frame_qindex(False)
                q = layer_qindex(base_q, step.layer)
                q = max(1, min(255,
                               q + self._aq_offset(frames[step.disp],
                                                   stats)))
                self._dispatch_code(step, frames[step.disp], q,
                                    pending_pins.pop(step.disp, 0),
                                    alt=hi, stats=stats if aq2 else None)
                self._unpin(step.fwd)
                if step.bwd is not None:
                    self._unpin(step.bwd)
            else:
                slot = self._store[step.disp]["slot"]
                payload = O.write_show_existing(slot)
                self._pending.append(("se", payload, step.disp))
                self._unpin(step.disp)
        self._anchor = hi

    # -- low-delay B (ref EB_PRED_LOW_DELAY_B) ----------------------------------
    def _ldb_send(self, frame: Frame, q_off: int = 0) -> None:
        import jax.numpy as jnp
        d = self._send_idx
        self._send_idx += 1
        key = self._is_key(d) or self._scene_cut(frame)
        qindex = self._frame_qindex(key)
        qindex = max(1, min(255, qindex + self._aq_offset(frame)))
        if not key:
            qindex = max(1, min(255, qindex + q_off))
        if key or getattr(self, "_ldb_last", None) is None:
            out, deb, planes, nbh, nbw = self._intra_dispatch(frame, qindex)
            kmeta = {"display": d, "show": True, "order_hint": 0}
            if self.cfg.enable_restoration and deb is not None:
                lr, pl, planes = self._lr_from_dev(frame, deb[:3],
                                                   deb[4:7])
                kmeta.update(lr=lr, lr_planes=tuple(pl))
            self._ldb_golden = (planes, 0)      # (dev planes, slot)
            self._ldb_last = (planes, 0)
            self._enqueue_key(frame, out, deb, kmeta, qindex, nbh, nbw)
            return
        cfg = self.cfg
        ph, pw = self.seq.mi_rows * 4, self.seq.mi_cols * 4
        ph32, pw32 = -(-ph // 64) * 64, -(-pw // 64) * 64
        sy, su, sv = self._upload_src(frame)
        lvls = self._lf_levels(qindex, False)
        fn = PE.build_b_frame_encoder_dyn(
            ph32, pw32, self.seq.mi_rows, self.seq.mi_cols,
            cdef=cfg.enable_cdef, bd=cfg.bit_depth, rdo=self._rdo,
            txs=self._txs, filt=self._pick_interp(frame, qindex),
            lr=cfg.enable_restoration, rect=self._rect)
        out = fn(sy, su, sv, *self._ldb_last[0], *self._ldb_golden[0],
                 jnp.int32(qindex), jnp.int32(lvls[0]), jnp.int32(lvls[2]),
                 jnp.int32(lvls[3]))
        last_slot, golden_slot = self._ldb_last[1], self._ldb_golden[1]
        new_slot = 1 if last_slot != 1 else 2
        meta_lr = {}
        if cfg.enable_restoration:
            lr, pl, planes = self._lr_from_dev(frame, out[5:8], out[-3:])
            out = out[:-3]
            meta_lr = {"lr": lr, "lr_planes": tuple(pl)}
        else:
            planes = self._as_ref_planes(out[5][:ph, :pw],
                                         out[6][: ph // 2, : pw // 2],
                                         out[7][: ph // 2, : pw // 2])
        self._ldb_last = (planes, new_slot)
        ls = last_slot
        meta = {"display": d, "show": True, "nrefs": 2,
                "ref_types": (1, 4),            # LAST, GOLDEN
                "order_hint": 0,
                "refresh": 1 << new_slot,
                "ref_idx": (ls, ls, ls, golden_slot, ls, ls, ls),
                "ref_hints": (0,) * 7, **meta_lr}
        lay = PE.inter_layout(2, False, self._txs, lv8=True, lr=False,
                              rect=self._rect)
        self._enqueue_p(frame, out, lay, qindex, meta)

    def _pick_interp(self, frame: Frame, qindex: int) -> int:
        """Resolve the stream's interpolation filter (spec
        interpolation_filter; decided once, see __init__)."""
        if self._interp_filt is None:
            from svt_av1_tpu.pipeline.analysis import (analyze,
                                                       pick_interp_filter)
            self._interp_filt = pick_interp_filter(
                analyze(frame.y), qindex, self.cfg.bit_depth)
        return self._interp_filt

    def _dispatch_code(self, step, frame: Frame, qindex: int,
                       pins: int, alt=None, stats=None) -> None:
        """Device-dispatch one hier frame (P for the base layer, multi-
        ref B otherwise) and enqueue its packet metadata.

        alt: display index of the mini-GOP base (alive for the whole
        span) — interior frames add it as a THIRD single-prediction
        reference (ALTREF) when multi-ref is on (ref Av1GenerateRpsInfo
        4-slot lists, EbPictureDecisionProcess.c:1094)."""
        import jax.numpy as jnp
        cfg = self.cfg
        ph, pw = self.seq.mi_rows * 4, self.seq.mi_cols * 4
        ph32, pw32 = -(-ph // 64) * 64, -(-pw // 64) * 64
        sy, su, sv = self._upload_src(frame)
        fwd = self._store[step.fwd]
        lvls = self._lf_levels(qindex, False)
        dyn = (jnp.int32(qindex), jnp.int32(lvls[0]), jnp.int32(lvls[2]),
               jnp.int32(lvls[3]))
        # per-superblock delta-q AQ (spec 5.9.17): variance-masking map
        # from picture analysis; residual quantization goes per-SB on
        # device, the entropy stage codes the per-SB deltas
        DQ_RES = 2
        qmap = None
        aq_on = int(cfg.enable_adaptive_quantization) >= 2
        if aq_on:
            from svt_av1_tpu.pipeline.analysis import analyze, aq_sb_qmap
            m = aq_sb_qmap(stats if stats is not None
                           else analyze(frame.y), qindex, res=DQ_RES,
                           bd=cfg.bit_depth)
            qmap = np.full((ph32 // 64, pw32 // 64), qindex, np.int32)
            qmap[: m.shape[0], : m.shape[1]] = m[: ph32 // 64,
                                                 : pw32 // 64]
        compound = False
        third = None
        if step.bwd is None:
            fn = PE.build_p_frame_encoder_dyn(
                ph32, pw32, self.seq.mi_rows, self.seq.mi_cols,
                cdef=cfg.enable_cdef, bd=cfg.bit_depth, rdo=self._rdo,
                txs=self._txs, filt=self._pick_interp(frame, qindex),
                lr=cfg.enable_restoration, rect=self._rect, aq=aq_on)
            extra_aq = ((jnp.asarray(qmap),) if aq_on else ())
            out = fn(sy, su, sv, *fwd["dev"], *dyn, *extra_aq)
            nrefs = 1
        else:
            bwd = self._store[step.bwd]
            compound = cfg.compound_mode > 0
            if (self._mrp and alt is not None
                    and alt not in (step.fwd, step.bwd)
                    and alt in self._store):
                third = self._store[alt]
            nrefs = 3 if third is not None else 2
            if nrefs == 3:
                self._nrefs3_frames = getattr(self, "_nrefs3_frames",
                                              0) + 1
            fn = PE.build_b_frame_encoder_dyn(
                ph32, pw32, self.seq.mi_rows, self.seq.mi_cols,
                cdef=cfg.enable_cdef, compound=compound, bd=cfg.bit_depth,
                rdo=self._rdo, txs=self._txs,
                filt=self._pick_interp(frame, qindex),
                lr=cfg.enable_restoration, rect=self._rect, nrefs=nrefs,
                aq=aq_on)
            extra = third["dev"] if third is not None else ()
            extra_aq = ((jnp.asarray(qmap),) if aq_on else ())
            out = fn(sy, su, sv, *fwd["dev"], *bwd["dev"], *extra, *dyn,
                     *extra_aq)
        slot = self._free_slots.pop(0)
        meta_lr = {}
        if cfg.enable_restoration:
            lr, pl, planes = self._lr_from_dev(frame, out[5:8], out[-3:])
            out = out[:-3]
            meta_lr = {"lr": lr, "lr_planes": tuple(pl)}
        else:
            planes = self._as_ref_planes(out[5][:ph, :pw],
                                         out[6][: ph // 2, : pw // 2],
                                         out[7][: ph // 2, : pw // 2])
        self._store[step.disp] = {"dev": planes, "slot": slot, "pins": pins}
        fs = fwd["slot"]
        bs = fs if step.bwd is None else self._store[step.bwd]["slot"]
        fh = self._hint(step.fwd)
        bh = fh if step.bwd is None else self._hint(step.bwd)
        if nrefs == 3:
            # LAST + BWDREF (near bwd, compound partner) + ALTREF (span
            # base): 3-slot ref list (ref 4-slot RPS lists)
            ts = third["slot"]
            th = self._hint(alt)
            ref_types = (1, 5, 7)
            ref_idx = (fs, fs, fs, fs, bs, ts, ts)
            ref_hints = (fh, fh, fh, fh, bh, th, th)
        else:
            ref_types = (1, 7)              # LAST, ALTREF
            ref_idx = (fs, fs, fs, fs, bs, bs, bs)
            ref_hints = (fh, fh, fh, fh, bh, bh, bh)
        meta = {"display": step.disp, "show": False, "nrefs": nrefs,
                "ref_types": ref_types, "layer": step.layer,
                "compound": compound,
                **({"qmap": qmap, "dq_res": DQ_RES} if aq_on else {}),
                "order_hint": self._hint(step.disp),
                "refresh": 1 << slot,
                "ref_idx": ref_idx,
                "ref_hints": ref_hints, **meta_lr}
        lay = PE.inter_layout(nrefs, compound, self._txs, lv8=True,
                              lr=False, rect=self._rect)
        self._enqueue_p(frame, out, lay, qindex, meta)

    def _dispatch_inbox(self) -> None:
        if not self._inbox:
            return
        qindex = self._frame_qindex(True)
        frames, self._inbox = self._inbox, []
        import jax.numpy as jnp
        ph, pw = self.seq.mi_rows * 4, self.seq.mi_cols * 4
        nbh, nbw = ph // 8, pw // 8
        sy_b = jnp.asarray(np.stack([IE.block_planes(
            IE.pad_plane(f.y, ph, pw), 8) for f in frames]))
        su_b = jnp.asarray(np.stack([IE.block_planes(
            IE.pad_plane(f.u, ph // 2, pw // 2), 4) for f in frames]))
        sv_b = jnp.asarray(np.stack([IE.block_planes(
            IE.pad_plane(f.v, ph // 2, pw // 2), 4) for f in frames]))
        if self._rc is None:
            out = IE.build_batch_frame_encoder(
                nbh, nbw, qindex, self.cfg.bit_depth,
                rich=self._txs)(sy_b, su_b, sv_b)
        else:
            # dynamic-q batch (per-batch shared q; VBR feedback per batch)
            out = IE.build_batch_frame_encoder_dyn(
                nbh, nbw, self.cfg.bit_depth, rich=self._txs)(
                sy_b, su_b, sv_b, jnp.int32(qindex))
        deb = None
        lr_on = self.cfg.enable_restoration
        if (self.cfg.enable_deblocking or self.cfg.enable_cdef
                or lr_on) and \
                (self._need_recon() or self.cfg.enable_cdef or lr_on):
            import jax
            from svt_av1_tpu.ops import cdef as CDEF
            y = jax.vmap(_unblock_dev)(out[4])
            u = jax.vmap(_unblock_dev)(out[5])
            v = jax.vmap(_unblock_dev)(out[6])
            lvls = self._lf_levels(qindex, True)
            # source planes for the CDEF SSE search come from the SAME
            # device arrays the encode consumed (no second upload)
            sy = jax.vmap(_unblock_dev)(sy_b)
            su = jax.vmap(_unblock_dev)(su_b)
            sv = jax.vmap(_unblock_dev)(sv_b)
            sk = ((out[1] == 0).all((-1, -2)) & (out[2] == 0).all((-1, -2))
                  & (out[3] == 0).all((-1, -2)))
            deb = _intra_postproc_fn(ph, pw, True, self.cfg.enable_cdef,
                                     self.cfg.bit_depth, lr=lr_on)(
                y, u, v, sy, su, sv, sk,
                jnp.int32(lvls[0]), jnp.int32(lvls[2]), jnp.int32(lvls[3]),
                jnp.int32(CDEF.pick_damping(qindex)))
        self._pending.append(("batch", frames, out, nbh, nbw, qindex, deb,
                              None, self._frame_idx))
        self._frame_idx += len(frames)

    @property
    def _px(self):
        return np.uint8 if self.cfg.bit_depth == 8 else np.uint16

    def _upload_src(self, frame: Frame):
        """One host->device transfer for a frame's three planes.

        The tunneled link charges per-transfer overhead on top of
        ~40 MB/s, so the planes ride ONE concatenated byte buffer; a
        trivial jitted splitter (execute ops are ~1 ms) restores the
        plane views device-side."""
        import jax
        ph, pw = self.seq.mi_rows * 4, self.seq.mi_cols * 4
        ph32, pw32 = -(-ph // 64) * 64, -(-pw // 64) * 64
        px = self._px
        y = IE.pad_plane(frame.y.astype(px), ph32, pw32)
        u = IE.pad_plane(frame.u.astype(px), ph32 // 2, pw32 // 2)
        v = IE.pad_plane(frame.v.astype(px), ph32 // 2, pw32 // 2)
        buf = np.concatenate([y.reshape(-1), u.reshape(-1), v.reshape(-1)])
        return _split_planes(ph32, pw32, np.dtype(px).name)(
            jax.device_put(buf))

    def _as_ref_planes(self, y, u, v):
        """Edge-pad recon planes to the 32-padded inter geometry (the
        mirror decoder pads its references identically)."""
        import jax.numpy as jnp
        ph, pw = self.seq.mi_rows * 4, self.seq.mi_cols * 4
        ph32, pw32 = -(-ph // 64) * 64, -(-pw // 64) * 64
        pads = ((0, ph32 - ph), (0, pw32 - pw))
        padc = ((0, (ph32 - ph) // 2), (0, (pw32 - pw) // 2))
        return (jnp.pad(y, pads, mode="edge"),
                jnp.pad(u, padc, mode="edge"),
                jnp.pad(v, padc, mode="edge"))

    def _lr_process(self, frame: Frame, planes, deb):
        """Per-plane loop restoration: Wiener AND self-guided searches
        against the source; each plane signals whichever type wins more
        total SSE, applied in place into ``planes``.  ``deb`` holds the
        deblocked (pre-CDEF) planes the stripe context rows come from
        (spec save_deblock_boundary_lines; ref EbCdefProcess.c:545-558).
        Returns the per-plane lr list [{type, unit, use, ...}|None]*3
        (ref rest_kernel search: search_wiener + search_sgrproj,
        EbRestorationPick.c:705; host stage like entropy)."""
        from svt_av1_tpu.ops import restoration as LRR
        out = []
        for p in range(3):
            ss = 0 if p == 0 else 1
            h = self.seq.height if p == 0 else (self.seq.height + 1) // 2
            w = self.seq.width if p == 0 else (self.seq.width + 1) // 2
            unit = 64 >> ss          # luma 64, chroma 32 (lr_uv_shift=1)
            srcp = (frame.y, frame.u, frame.v)[p]
            src = srcp[:h, :w].astype(np.int32)
            crop = np.ascontiguousarray(planes[p][:h, :w].astype(np.int32))
            dsub = np.ascontiguousarray(deb[p][:h, :w].astype(np.int32))
            use_w, taps = LRR.search_wiener_plane(
                src, crop, dsub, unit, ss, bd=self.cfg.bit_depth)
            # preset-gated SGR candidate set (ref sg_filter_mode,
            # EbRestorationPick.c: fast presets search a reduced ep
            # set); the full 8-ep sweep costs ~18 s/plane at 4K on host
            eps = ((4, 11) if self.cfg.enc_mode >= 6
                   else (0, 4, 7, 9, 11, 13, 14, 15))
            use_s, ep, xqd, sse_s = LRR.search_sgr_plane(
                src, crop, dsub, unit, ss, eps=eps,
                bd=self.cfg.bit_depth)
            # plane-level type pick by realized SSE (off-RU keeps self)
            got_w = crop
            if use_w.any():
                got_w = LRR.apply_wiener_plane(crop, dsub, unit, ss,
                                               use_w, taps,
                                               self.cfg.bit_depth)
            sse_w = ((got_w.astype(np.int64) - src) ** 2).sum()
            if use_s.any() and sse_s.sum() < sse_w:
                got = LRR.apply_sgr_plane(crop, dsub, unit, ss, use_s,
                                          ep, xqd, self.cfg.bit_depth)
                planes[p][:h, :w] = got
                out.append({"unit": unit, "type": 3, "use": use_s,
                            "ep": ep, "xqd": xqd})
            elif use_w.any():
                planes[p][:h, :w] = got_w
                out.append({"unit": unit, "type": 2, "use": use_w,
                            "taps": taps})
            else:
                out.append(None)
        return out if any(p is not None for p in out) else None

    def _sc_active(self, frame: Frame) -> bool:
        """Screen-content gate for this stream (mode 1 on; mode 2
        auto-detected once from the first keyframe's luma)."""
        if self._sc_mode == 0:
            return False
        if self._sc_mode == 1:
            return True
        if self._sc_auto is None:
            from svt_av1_tpu.pipeline import ibc as IBC
            self._sc_auto = IBC.detect_screen_content(frame.y)
        return self._sc_auto

    def _intra_dispatch(self, frame: Frame, qindex: int):
        """Keyframe device dispatch; returns (out, deb, as-ref planes,
        nbh, nbw).  Screen-content keyframes with hash-ME hits become
        allow_intrabc frames: the IBC maps join the device step, the
        in-loop filter postproc is skipped (spec: allow_intrabc turns
        DLF/CDEF/LR off), and the maps are remembered for the packet."""
        import jax.numpy as jnp
        ph, pw = self.seq.mi_rows * 4, self.seq.mi_cols * 4
        ibc_maps = None
        if self._sc_active(frame):
            from svt_av1_tpu.pipeline import ibc as IBC
            use, dv = IBC.hash_dv_map(frame.y, self.seq.mi_rows,
                                      self.seq.mi_cols)
            if use.any():
                ibc_maps = (use, dv.astype(np.int32))
                self._ibc_by_idx[self._frame_idx] = ibc_maps
        part16 = self._rdo and ibc_maps is None
        # ONE dynamic-q keyframe variant serves CQP and RC alike (the
        # static-q builder doubled the compile-variant space per
        # geometry; cold remote compiles cost minutes)
        nbh, nbw = ph // 8, pw // 8
        sy = jnp.asarray(IE.block_planes(
            IE.pad_plane(frame.y.astype(self._px), ph, pw), 8))
        su = jnp.asarray(IE.block_planes(
            IE.pad_plane(frame.u.astype(self._px), ph // 2, pw // 2),
            4))
        sv = jnp.asarray(IE.block_planes(
            IE.pad_plane(frame.v.astype(self._px), ph // 2, pw // 2),
            4))
        extra = ()
        if ibc_maps is not None:
            extra = (jnp.asarray(ibc_maps[0]),
                     jnp.asarray(ibc_maps[1][..., 0]),
                     jnp.asarray(ibc_maps[1][..., 1]))
        out = IE.build_frame_encoder_dyn(nbh, nbw,
                                         self.cfg.bit_depth,
                                         rich=self._txs,
                                         part16=part16,
                                         ibc=ibc_maps is not None)(
            sy, su, sv, jnp.int32(qindex), *extra)
        planes = tuple(_unblock_dev(out[i]) for i in (4, 5, 6))
        deb = None
        if ibc_maps is not None:
            # allow_intrabc: no in-loop filters; raw recon is the ref
            return out, None, self._as_ref_planes(*planes), nbh, nbw
        if (self.cfg.enable_deblocking or self.cfg.enable_cdef
                or self.cfg.enable_restoration):
            from svt_av1_tpu.ops import cdef as CDEF
            lvls = self._lf_levels(qindex, True)
            sy = jnp.asarray(IE.pad_plane(frame.y.astype(self._px),
                                          ph, pw))
            su = jnp.asarray(IE.pad_plane(
                frame.u.astype(self._px), ph // 2, pw // 2))
            sv = jnp.asarray(IE.pad_plane(
                frame.v.astype(self._px), ph // 2, pw // 2))
            # per-cell coded-skip map (CDEF skips skip blocks, spec 7.15)
            sk = ((out[1] == 0).all((-1, -2)) & (out[2] == 0).all((-1, -2))
                  & (out[3] == 0).all((-1, -2)))
            extra = ()
            if part16:
                sk16 = ((out[11] == 0).all((-1, -2))
                        & (out[12] == 0).all((-1, -2))
                        & (out[13] == 0).all((-1, -2)))
                rep16 = jnp.repeat(jnp.repeat(sk16, 2, 0), 2, 1)
                sk = jnp.where(out[10] == 16, rep16[:nbh, :nbw], sk)
                extra = (out[10],)
            deb = _intra_postproc_fn(ph, pw, False,
                                     self.cfg.enable_cdef,
                                     self.cfg.bit_depth, part16,
                                     lr=self.cfg.enable_restoration)(
                *planes, sy, su, sv, sk, *extra,
                jnp.int32(lvls[0]), jnp.int32(lvls[2]),
                jnp.int32(lvls[3]),
                jnp.int32(CDEF.pick_damping(qindex)))
            planes = deb[:3]
        return out, deb, self._as_ref_planes(*planes), nbh, nbw

    def _lr_from_dev(self, frame: Frame, rec_dev, deb_dev):
        """Fetch recon + deblocked planes, run the per-plane LR search,
        and return (lr, restored host planes, restored device ref
        planes).  One synchronous round trip per LR frame — restoration
        output is the reference buffer content (spec), so the chain
        cannot proceed device-side until LR lands."""
        import jax
        import jax.numpy as jnp
        ph, pw = self.seq.mi_rows * 4, self.seq.mi_cols * 4
        vals = jax.device_get(list(rec_dev) + list(deb_dev))
        pl = [np.asarray(vals[0][:ph, :pw], np.int32),
              np.asarray(vals[1][: ph // 2, : pw // 2], np.int32),
              np.asarray(vals[2][: ph // 2, : pw // 2], np.int32)]
        dpl = [np.asarray(vals[3][:ph, :pw], np.int32),
               np.asarray(vals[4][: ph // 2, : pw // 2], np.int32),
               np.asarray(vals[5][: ph // 2, : pw // 2], np.int32)]
        lr = self._lr_process(frame, pl, dpl)
        refs = self._as_ref_planes(jnp.asarray(pl[0].astype(self._px)),
                                   jnp.asarray(pl[1].astype(self._px)),
                                   jnp.asarray(pl[2].astype(self._px)))
        return lr, pl, refs

    def _dispatch_one(self, frame: Frame, q_off: int = 0) -> None:
        """IPPP chain: keyframes via the wavefront intra path, P frames via
        the bulk-parallel inter path; recon planes stay device-resident
        between frames (no host round-trip along the reference chain)."""
        import jax.numpy as jnp

        key = self._is_key(self._send_idx) or self._scene_cut(frame)
        qindex = self._frame_qindex(key)
        qindex = max(1, min(255, qindex + self._aq_offset(frame)))
        if not key:
            qindex = max(1, min(255, qindex + q_off))
        self._send_idx += 1
        ph, pw = self.seq.mi_rows * 4, self.seq.mi_cols * 4
        ph32, pw32 = -(-ph // 64) * 64, -(-pw // 64) * 64

        if key or self._ref_dev is None:
            out, deb, ref_planes, nbh, nbw = self._intra_dispatch(frame,
                                                                  qindex)
            meta = None
            if self.cfg.enable_restoration and deb is not None:
                lr, pl, ref_planes = self._lr_from_dev(
                    frame, deb[:3], deb[4:7])
                meta = {"lr": lr, "lr_planes": tuple(pl),
                        "show": True, "display": self._send_idx - 1,
                        "order_hint": 0}
            self._ref_dev = ref_planes
            if self._warp:
                self._set_ref_host(ref_planes)
            if self._gm_enab:
                self._gm_prev_src = frame.y
            self._enqueue_key(frame, out, deb, meta, qindex, nbh, nbw)
        else:
            sy, su, sv = self._upload_src(frame)
            # GM is a TRACED runtime input, never a compile key: the
            # estimator returning None on some frame must not trigger a
            # mid-stream recompile (round-4 driver bench: one such flip
            # cost a ~170 s cold remote compile INSIDE the timed region,
            # 720p 9.8 -> 0.265 fps).  gm_on is config-static; a None
            # estimate rides as the (0,0) vector, which only adds a
            # zero-MV candidate the ME sweep already covers.
            gmv = None
            gm_on = self._gm_enab
            if self._gm_enab and self._gm_prev_src is not None:
                from svt_av1_tpu.pipeline.analysis import (
                    estimate_global_translation)
                gmv = estimate_global_translation(
                    self._gm_prev_src, frame.y,
                    max_fullpel=PE.SEARCH_RANGE - 1)
                self._gm_prev_src = frame.y
                if gmv is not None:
                    self._gm_by_idx[self._send_idx - 1] = {1: gmv}
            gm_args = (() if not gm_on
                       else (jnp.asarray(np.asarray(gmv or (0, 0),
                                                    np.int32)),))
            if self._warp:
                self._warp_dispatch(frame, sy, su, sv, qindex, gmv,
                                    gm_args)
                return
            # ONE dynamic-q variant serves CQP and RC/lookahead alike
            # (the static-q builder doubled the compile-variant space
            # per geometry for a negligible constant-folding win)
            lvls = self._lf_levels(qindex, False)
            fn = PE.build_p_frame_encoder_dyn(
                ph32, pw32, self.seq.mi_rows, self.seq.mi_cols,
                cdef=self.cfg.enable_cdef, bd=self.cfg.bit_depth,
                rdo=self._rdo, txs=self._txs,
                filt=self._pick_interp(frame, qindex),
                gm=gm_on, lr=self.cfg.enable_restoration,
                rect=self._rect)
            out = fn(sy, su, sv, *self._ref_dev, jnp.int32(qindex),
                     jnp.int32(lvls[0]), jnp.int32(lvls[2]),
                     jnp.int32(lvls[3]), *gm_args)
            meta = None
            if self.cfg.enable_restoration:
                lr, pl, self._ref_dev = self._lr_from_dev(
                    frame, out[5:8], out[-3:])
                out = out[:-3]
                meta = {"lr": lr, "lr_planes": tuple(pl), "show": True,
                        "display": self._send_idx - 1, "order_hint": 0,
                        "refresh": 0x01, "ref_idx": (0,) * 7,
                        "ref_hints": (0,) * 7}
            else:
                self._ref_dev = self._as_ref_planes(out[5][:ph, :pw],
                                       out[6][: ph // 2, : pw // 2],
                                       out[7][: ph // 2, : pw // 2])
            lay = PE.inter_layout(1, False, self._txs, lv8=True,
                                  lr=False, rect=self._rect)
            self._enqueue_p(frame, out, lay, qindex, meta)

    def _enqueue_p(self, frame: Frame, out, lay, qindex: int,
                   meta, arrs=None) -> None:
        """Submit an inter frame's fetch + entropy to the host pool and
        queue its future in decode order (see _ec_pool in __init__).
        arrs: pre-fetched step outputs (warp path fetches eagerly)."""
        idx = self._frame_idx
        self._frame_idx += 1
        fut = self._ec_pool.submit(self._inter_packet_job, frame, out,
                                   qindex, meta, idx, lay, arrs)
        self._pending.append(("pf", fut, meta, idx))

    def _inter_packet_job(self, frame, out, qindex, meta, idx, lay,
                          arrs=None):
        with self._tracer.span("entropy+packetize", idx):
            return self._make_inter_packet(frame, out, qindex, meta, idx,
                                           lay=lay, arrs=arrs)

    def _set_ref_host(self, ref_planes) -> None:
        """Host copy of the reference cropped to true frame dims — the
        warp filter clamps against these (spec 7.11.3.5)."""
        import jax
        h, w = self.seq.height, self.seq.width
        ch, cw = (h + 1) // 2, (w + 1) // 2
        y, u, v = jax.device_get(list(ref_planes))
        self._ref_host = [np.asarray(y[:h, :w], np.int32),
                          np.asarray(u[:ch, :cw], np.int32),
                          np.asarray(v[:ch, :cw], np.int32)]

    def _warp_dispatch(self, frame: Frame, sy, su, sv, qindex: int,
                       gmv, gm_args) -> None:
        """Warped-motion P frame: filterless device step -> host warp
        pass (pipeline/warp_pass) -> device deblock/CDEF postproc.
        One synchronous round trip per frame, like the LR path —
        WARPED_CAUSAL params are derived from the FINAL motion field
        (what the decoder does), so the flip must land before the
        in-loop filters and before the recon becomes a reference."""
        import jax
        import jax.numpy as jnp
        from svt_av1_tpu.ops import cdef as CDEF
        from svt_av1_tpu.pipeline import warp_pass as WPASS
        cfg = self.cfg
        ph, pw = self.seq.mi_rows * 4, self.seq.mi_cols * 4
        ph32, pw32 = -(-ph // 64) * 64, -(-pw // 64) * 64
        fn = PE.build_p_frame_encoder_dyn(
            ph32, pw32, self.seq.mi_rows, self.seq.mi_cols,
            cdef=False, bd=cfg.bit_depth, rdo=self._rdo, txs=self._txs,
            filt=self._pick_interp(frame, qindex), gm=bool(gm_args),
            lr=False, rect=self._rect, filters=False)
        z = jnp.int32(0)
        out = fn(sy, su, sv, *self._ref_dev, jnp.int32(qindex), z, z, z,
                 *gm_args)
        lay = PE.inter_layout(1, False, self._txs, lv8=True, lr=False,
                              rect=self._rect)
        arrs = self._fetch_inter_arrs(out, lay, force_recon=True)
        # the warp pass patches level packs / tx types in place; arrays
        # from device_get are read-only views
        for n in ("ly", "lu", "lv", "txty"):
            if n in lay:
                arrs[lay[n]] = np.array(arrs[lay[n]])
        sizes = arrs[lay["sizes"]]
        mv = arrs[lay["mv"]].astype(np.int32)
        shapes = arrs.get(lay.get("shape8"))
        txty = arrs.get(lay.get("txty"))
        rec = [np.ascontiguousarray(arrs[lay["rec_y"]][:ph, :pw]
                                    .astype(np.int32)),
               np.ascontiguousarray(arrs[lay["rec_u"]][: ph // 2,
                                                       : pw // 2]
                                    .astype(np.int32)),
               np.ascontiguousarray(arrs[lay["rec_v"]][: ph // 2,
                                                       : pw // 2]
                                    .astype(np.int32))]
        srcp = [IE.pad_plane(frame.y.astype(np.int32), ph, pw),
                IE.pad_plane(frame.u.astype(np.int32), ph // 2, pw // 2),
                IE.pad_plane(frame.v.astype(np.int32), ph // 2, pw // 2)]
        warp8 = None
        if self._ref_host is not None:
            with self._tracer.span("warp-pass"):
                warp8, _n = WPASS.warp_pass(
                    srcp, rec, self._ref_host, arrs, lay, sizes, mv,
                    shapes, qindex, self.seq.mi_rows, self.seq.mi_cols,
                    cfg.bit_depth, txty=txty)
        # per-direction tx extents + leaf skip for the filter postproc
        nb8h, nb8w = ph // 8, pw // 8
        sz = sizes[:nb8h, :nb8w].astype(np.int32)
        shp = (None if shapes is None
               else shapes[:nb8h, :nb8w].astype(np.int32))
        szw = sz if shp is None else np.where(shp == 2, sz // 2, sz)
        szh = sz if shp is None else np.where(shp == 1, sz // 2, sz)
        sk8 = WPASS.leaf_skip_cells(
            sizes, shapes, arrs[lay["ly"]], arrs[lay["lu"]],
            arrs[lay["lv"]])[:nb8h, :nb8w]
        lvls = self._lf_levels(qindex, False)
        px = self._px
        f = _inter_postproc_fn(ph, pw, cfg.enable_cdef, cfg.bit_depth)
        y, u, v, idx_sb = f(
            jnp.asarray(rec[0].astype(px)), jnp.asarray(rec[1].astype(px)),
            jnp.asarray(rec[2].astype(px)),
            jnp.asarray(srcp[0]), jnp.asarray(srcp[1]),
            jnp.asarray(srcp[2]), jnp.asarray(sk8),
            jnp.asarray(szw), jnp.asarray(szh),
            jnp.int32(lvls[0]), jnp.int32(lvls[2]), jnp.int32(lvls[3]),
            jnp.int32(CDEF.pick_damping(qindex)))
        self._ref_dev = self._as_ref_planes(y, u, v)
        hy, hu, hv, hidx = jax.device_get([y, u, v, idx_sb])
        h, w = self.seq.height, self.seq.width
        self._ref_host = [np.asarray(hy[:h, :w], np.int32),
                          np.asarray(hu[: (h + 1) // 2, : (w + 1) // 2],
                                     np.int32),
                          np.asarray(hv[: (h + 1) // 2, : (w + 1) // 2],
                                     np.int32)]
        meta = {"warp8": warp8, "show": True,
                "display": self._send_idx - 1, "order_hint": 0,
                "refresh": 0x01, "ref_idx": (0,) * 7,
                "ref_hints": (0,) * 7,
                "cdef_idx": (np.asarray(hidx) if cfg.enable_cdef
                             else None),
                "lr_planes": (np.asarray(hy), np.asarray(hu),
                              np.asarray(hv))}
        self._enqueue_p(frame, None, lay, qindex, meta, arrs=arrs)

    def _enqueue_key(self, frame: Frame, out, deb, meta, qindex: int,
                     nbh: int, nbw: int) -> None:
        """Submit a keyframe's fetch + entropy to the host pool (like
        _enqueue_p): the 1080p keyframe costs ~1.5 s of wavefront device
        time + a multi-MB fetch + host entropy — on the main thread it
        stalled the whole decode-order queue behind it."""
        idx = self._frame_idx
        self._frame_idx += 1
        fut = self._ec_pool.submit(self._key_packet_job, frame, out, deb,
                                   meta, qindex, nbh, nbw, idx)
        self._pending.append(("pf", fut, meta, idx))

    def _key_packet_job(self, frame, out, deb, meta, qindex, nbh, nbw,
                        base_idx) -> Packet:
        with self._tracer.span("entropy+packetize", base_idx):
            import jax
            # packed single-transfer fetch; recon planes are skipped
            # when the in-loop-filter postproc (deb) supersedes them or
            # nobody wants recon back — on the ~40 MB/s tunnel the 3 MB
            # planes and the extra RTTs are real time
            skip = (set(range(4, 7))
                    if (deb is not None or not self._need_recon())
                    else set())
            idxs = tuple(i for i in range(len(out)) if i not in skip)
            entries = tuple((i, tuple(out[i].shape),
                             np.dtype(out[i].dtype).name, "")
                            for i in idxs)
            buf = np.asarray(jax.device_get(
                _fetch_packer(entries)(*[out[i] for i in idxs])))
            arrs, off = {}, 0
            for i, shp, dt, _tag in entries:
                cnt_ = int(np.prod(shp))
                arrs[i] = np.frombuffer(
                    buf, np.dtype(dt), cnt_, off).reshape(shp)
                off += cnt_ * np.dtype(dt).itemsize
            dev = IE.materialize_frame(out, nbh, nbw, arrs=arrs)
            if deb is not None:
                lr_here = (self.cfg.enable_restoration
                           and (meta is None or "lr" not in meta))
                if self._need_recon() or lr_here:
                    f = jax.device_get(list(deb))
                    planes = [np.asarray(a) for a in f[:3]]
                    idx = np.asarray(f[3]) if len(f) > 3 else None
                    dev["recon_y"], dev["recon_u"], dev["recon_v"] = planes
                    if len(f) > 6:
                        (dev["deb_y"], dev["deb_u"],
                         dev["deb_v"]) = [np.asarray(a) for a in f[4:7]]
                else:
                    idx = (np.asarray(jax.device_get(deb[3]))
                           if len(deb) > 3 else None)
                dev["cdef_idx"] = None if idx is None else idx
            return self._make_packet(frame, dev, qindex, meta, base_idx)

    def _finish_one(self) -> None:
        with self._tracer.span("collect", None):
            self._finish_one_inner()

    def _finish_one_inner(self) -> None:
        entry = self._pending.pop(0)
        if entry[0] == "se":
            pkt = Packet(entry[1], entry[2], False, show=True,
                         display_idx=entry[2])
            self._packets.append(pkt)
            if self._rc is not None:
                self._rc.update(len(pkt.payload) * 8, False, layer=-1)
            return
        if entry[0] == "pf":
            _, fut, meta, idx = entry
            pkt = fut.result()
            if meta is not None:
                pkt.show = meta["show"]
                pkt.display_idx = meta["display"]
                pkt.pts = meta["display"] if pkt.show else -1
            else:
                pkt.pts = idx
            self._packets.append(pkt)
            if self._rc is not None:
                self._rc.update(len(pkt.payload) * 8, pkt.is_keyframe,
                                layer=(meta or {}).get("layer", 0),
                                qindex=pkt.qindex)
            return
        kind, frames, out, nbh, nbw, qindex = entry[:6]
        deb = entry[6] if len(entry) > 6 else None
        meta = entry[7] if len(entry) > 7 else None
        base_idx = entry[8]
        with self._tracer.span("entropy+packetize", base_idx):
            # keyframes go through _enqueue_key/_key_packet_job; only
            # the intra-only "batch" kind lands here
            devs = IE.materialize_batch(out, nbh, nbw,
                                        with_recon=self._need_recon())
            if deb is not None:
                # recon/output planes are the post-filter frames; only
                # the (tiny) cdef index map is needed when the caller
                # does not want recon back (bench path).  One batched
                # fetch (~30 ms RTT per transfer on the tunneled link).
                import jax
                lr_here = (self.cfg.enable_restoration
                           and (meta is None or "lr" not in meta))
                if self._need_recon() or lr_here:
                    f = jax.device_get(list(deb))
                    planes = [np.asarray(a) for a in f[:3]]
                    idx = np.asarray(f[3]) if len(f) > 3 else None
                    debpl = ([np.asarray(a) for a in f[4:7]]
                             if len(f) > 6 else None)
                else:
                    planes = None
                    debpl = None
                    idx = (np.asarray(jax.device_get(deb[3]))
                           if len(deb) > 3 else None)
                for i, d in enumerate(devs):
                    sel = lambda a, i=i: a[i]
                    if planes is not None:
                        d["recon_y"] = sel(planes[0])
                        d["recon_u"] = sel(planes[1])
                        d["recon_v"] = sel(planes[2])
                    if debpl is not None:
                        d["deb_y"] = sel(debpl[0])
                        d["deb_u"] = sel(debpl[1])
                        d["deb_v"] = sel(debpl[2])
                    d["cdef_idx"] = None if idx is None else sel(idx)
            if len(frames) > 1:
                # frames are entropy-independent: tile-code them across host
                # threads (the C coder releases the GIL) — the TPU analog of
                # the reference's pooled EntropyCoding processes
                with ThreadPoolExecutor(max_workers=min(8, len(frames))) as ex:
                    pkts = list(ex.map(
                        lambda ifd: self._make_packet(ifd[1][0], ifd[1][1],
                                                      qindex, meta,
                                                      base_idx + ifd[0]),
                        enumerate(zip(frames, devs))))
            else:
                pkts = [self._make_packet(frames[0], devs[0], qindex, meta,
                                          base_idx)]
        for i, p in enumerate(pkts):
            if meta is not None:
                p.show = meta["show"]
                p.display_idx = meta["display"]
                p.pts = meta["display"] if p.show else -1
            else:
                p.pts = base_idx + i
            self._packets.append(p)
            if self._rc is not None:
                self._rc.update(len(p.payload) * 8, p.is_keyframe,
                                qindex=p.qindex)

    def _fetch_inter_arrs(self, out, lay, force_recon: bool = False
                          ) -> dict:
        """ONE coalesced device->host fetch of an inter step's outputs.

        The tunneled link costs ~18 ms PER ARRAY (round-trip bound, not
        bytes — measured: 95 gets of any size ~ uniform 18 ms), so all
        non-plane outputs are bitcast + concatenated into a single
        uint8 buffer by a tiny jitted packer and pulled with one get;
        the host slices fields back out of the byte buffer.  Recon
        planes (only when needed) join the same packed get."""
        import jax
        import jax.numpy as jnp
        need_rec = self._need_recon() or force_recon
        skip = set()
        if not need_rec:
            skip |= {lay["rec_y"], lay["rec_u"], lay["rec_v"]}
        lv8 = "small" in lay
        sparse_rows = 0
        if lv8:
            skip |= {lay[n] for n in ("ly", "lu", "lv",
                                      "ly8", "lu8", "lv8")}
            # sparse rows included in the packed fetch: sized from an
            # EMA of recent nonzero-cell counts (the link is ~40 MB/s,
            # so every wasted row costs real time); denser frames fall
            # back to a second fetch below
            cap = PE.sparse_capacity(
                int(np.prod(out[lay["lflags"]].shape)))
            # ONE size per geometry (n_cells/16, i.e. ~6% nonzero cells
            # at 1080p): the packer is jitted per shape and a mid-run
            # shape change would recompile through the slow remote
            # compiler; the dense fallback below covers overflow
            n_cells = int(np.prod(out[lay["lflags"]].shape))
            sparse_rows = min(cap, max(512, n_cells // 16))
        for n in ("deb_y", "deb_u", "deb_v"):   # consumed at dispatch
            skip.add(lay.get(n))
        idxs = tuple(i for i in range(len(out)) if i not in skip)
        sparse_idx = (tuple(lay[n] for n in ("ply", "plu", "plv"))
                      if lv8 else ())
        mv_idx = {lay["mv"], lay.get("mv2")} - {None}
        bit_idx = {lay["lflags"]} if lv8 else set()
        entries = []
        for i in idxs:
            shp = ((sparse_rows,) + tuple(out[i].shape[1:])
                   if i in sparse_idx else tuple(out[i].shape))
            # byte shrinkers: MVs are quarter-pel (even 1/8-pel values,
            # |mv| <= SEARCH_RANGE*8+6) -> lossless int8 at 1/4-pel;
            # boolean cell flags ride as packed bits
            tag = ("mvq" if i in mv_idx
                   else "bits" if i in bit_idx else "")
            entries.append((i, shp, np.dtype(out[i].dtype).name, tag))
        packer = _fetch_packer(tuple(entries))
        buf = np.asarray(jax.device_get(packer(*[out[i] for i in idxs])))
        arrs = {}
        off = 0
        for i, shp, dt, tag in entries:
            cnt_ = int(np.prod(shp))
            if tag == "mvq":
                arrs[i] = (np.frombuffer(buf, np.int8, cnt_, off)
                           .astype(np.int16) * 2).reshape(shp)
                off += cnt_
            elif tag == "bits":
                nb = -(-cnt_ // 8)
                bits = np.unpackbits(
                    np.frombuffer(buf, np.uint8, nb, off))[:cnt_]
                arrs[i] = bits.astype(bool).reshape(shp)
                off += nb
            else:
                arrs[i] = np.frombuffer(buf, np.dtype(dt), cnt_,
                                        off).reshape(shp)
                off += cnt_ * np.dtype(dt).itemsize
        if lv8:
            flags = arrs[lay["lflags"]]
            cnt = int(arrs[lay["lcount"]])
            small = bool(arrs[lay["small"]])
            cap = PE.sparse_capacity(flags.size)
            if small and cnt <= cap:
                packs = [arrs[lay[n]] for n in ("ply", "plu", "plv")]
                if cnt > sparse_rows:   # dense frame: refetch full packs
                    packs = [np.asarray(v) for v in jax.device_get(
                        [out[lay[n]] for n in ("ply", "plu", "plv")])]
                nbh8, nbw8 = flags.shape
                idx = np.flatnonzero(flags.reshape(-1))
                for (n, t), v in zip((("ly", 8), ("lu", 4), ("lv", 4)),
                                     packs):
                    dense = np.zeros((nbh8 * nbw8, t * t), np.int16)
                    dense[idx] = v[:cnt]
                    arrs[lay[n]] = dense.reshape(nbh8, nbw8, t, t)
            elif small:
                vals = jax.device_get([out[lay[n + "8"]]
                                       for n in ("ly", "lu", "lv")])
                for n, v in zip(("ly", "lu", "lv"), vals):
                    arrs[lay[n]] = np.asarray(v).astype(np.int16)
            else:   # rare: some level exceeded int8 — pull the int16s
                vals = jax.device_get([out[lay[n]]
                                       for n in ("ly", "lu", "lv")])
                for n, v in zip(("ly", "lu", "lv"), vals):
                    arrs[lay[n]] = np.asarray(v)
        return arrs

    def _make_inter_packet(self, frame: Frame, out, qindex: int,
                           meta=None, coded_idx: int = 0,
                           lay=None, arrs=None) -> Packet:
        cfg = self.cfg
        if lay is None:
            lay = PE.inter_layout((meta or {}).get("nrefs", 1),
                                  bool((meta or {}).get("compound")),
                                  self._txs, lv8=True, lr=False,
                                  rect=self._rect)
        if arrs is None:
            with self._tracer.span("fetch"):
                arrs = self._fetch_inter_arrs(out, lay)
        sizes = arrs[lay["sizes"]]
        mv = arrs[lay["mv"]].astype(np.int32)
        # per-8x8-cell level tiles (the device's native pack); the C++
        # coder consumes them directly — per-size grids are stitched
        # only for the Python fallback paths, per tile, below
        packs = (arrs[lay["ly"]], arrs[lay["lu"]], arrs[lay["lv"]])
        shapes = arrs[lay["shape8"]] if "shape8" in lay else None
        if shapes is not None and not shapes.any():
            shapes = None       # square-only frame: keep the C++ path
        ry = arrs.get(lay["rec_y"])
        ru = arrs.get(lay["rec_u"])
        rv = arrs.get(lay["rec_v"])
        cdef_idx = arrs[lay["cdef"]] if cfg.enable_cdef else None
        warp8 = meta.get("warp8") if meta else None
        if meta is not None and meta.get("cdef_idx") is not None:
            # warp path: CDEF ran in the separate postproc step
            cdef_idx = meta["cdef_idx"]
        txty = arrs[lay["txty"]] if "txty" in lay else None
        # per-cell ref types from the device refsel map (0 -> ref0,
        # 1 -> ref1); hier-B pairs (LAST, ALTREF), low-delay B (LAST,
        # GOLDEN)
        refs8 = None
        mvs2 = None
        comp_pair = None
        ref_select = False
        nr = (meta or {}).get("nrefs", 1)
        if meta is not None and nr >= 2:
            types = meta.get("ref_types", (1, 7))
            mode8 = arrs[lay["ref8"]]
            # map the device's per-cell ref-index field to AV1 ref
            # types; index == nrefs marks a compound cell (0 in refs8,
            # frame-level pair = the two nearest refs)
            refs8 = np.zeros_like(mode8, np.uint8)
            for k in range(nr):
                refs8[mode8 == k] = types[k]
            if meta.get("compound"):
                # reference_select only when compound blocks exist —
                # single-ref-only frames keep the C++ fast path
                ref_select = bool((mode8 == nr).any())
                if ref_select:
                    mvs2 = arrs[lay["mv2"]].astype(np.int32)
                    comp_pair = (types[0], types[1])
        sign_bias = None
        if meta is not None:
            sign_bias = O.ref_sign_biases(self.seq, meta["order_hint"],
                                          meta["ref_hints"])
        # global motion decided at dispatch for this coded frame
        gm = self._gm_by_idx.pop(coded_idx, None)
        trows, tcols = O.tile_starts(self.seq, cfg.tile_columns_log2,
                                     cfg.tile_rows_log2)

        def sl(a, r0, c0, hm, wm, mi_cell, align=1):
            """Tile-slice a cell grid.  align rounds the cell counts up
            (into the 32-padded frame grids) so the C++ writer's
            nb8w*8/bs stride math stays exact for every tile width."""
            if a is None:
                return None
            rr, cc = r0 // mi_cell, c0 // mi_cell
            nr = -(-(-(-hm // mi_cell)) // align) * align
            nc = -(-(-(-wm // mi_cell)) // align) * align
            return np.ascontiguousarray(a[rr : rr + nr, cc : cc + nc])

        lr = meta.get("lr") if meta else None
        qmap = meta.get("qmap") if meta else None
        dq_res = meta.get("dq_res", 0) if meta else 0
        if meta is not None and meta.get("lr_planes") is not None:
            ry, ru, rv = meta["lr_planes"]

        def code_tile(r01, c01) -> bytes:
            (r0, r1), (c0, c1) = r01, c01
            hm, wm = r1 - r0, c1 - c0
            # 8-cell alignment keeps nb8 a multiple of 8 so the per-size
            # grid widths nb8*8/bs stay exact down to the 64 level
            t_sizes = sl(sizes, r0, c0, hm, wm, 2, align=8)
            t_mv = sl(mv, r0, c0, hm, wm, 2, align=8)
            t_refs = sl(refs8, r0, c0, hm, wm, 2, align=8)
            t_mv2 = sl(mvs2, r0, c0, hm, wm, 2, align=8)
            t_tt = sl(txty, r0, c0, hm, wm, 2, align=8)
            t_sh = sl(shapes, r0, c0, hm, wm, 2, align=8)
            t_ci = sl(cdef_idx, r0, c0, hm, wm, 16)
            t_pk = tuple(sl(a, r0, c0, hm, wm, 2, align=8) for a in packs)
            if t_sh is not None and not t_sh.any():
                t_sh = None
            t_wp = sl(warp8, r0, c0, hm, wm, 2, align=8)
            t_qm = sl(qmap, r0, c0, hm, wm, 16)
            fc = FrameContext(qindex)
            if (lr is None and t_sh is None and t_wp is None
                    and cfg.entropy_backend in ("auto", "cpp")):
                from svt_av1_tpu.entropy import backend as native
                if native.available():
                    return native.encode_tile_inter_cpp(
                        fc, hm, wm, qindex, t_sizes, t_mv, packs=t_pk,
                        cdef_idx=t_ci, refs=t_refs, sign_bias=sign_bias,
                        mvs2=t_mv2 if ref_select else None,
                        comp_pair=comp_pair or (1, 7), txty=t_tt, gm=gm,
                        qmap=t_qm, delta_q_res=dq_res)
                if cfg.entropy_backend == "cpp":
                    raise RuntimeError("C++ entropy backend unavailable")
            # Python writer (LR / rect / warp frames): stitch the
            # per-size leaf grids for THIS tile from the cell packs
            t_lv = {bs: tuple(_unpack_levels(t_pk[p], bs)
                              for p in range(3))
                    for bs in (8, 16, 32, 64)}
            if t_sh is not None:
                for key in ((8, 16), (16, 8), (16, 32), (32, 16)):
                    t_lv[key] = tuple(
                        _unpack_levels_rect(t_pk[p], key[0] // 8,
                                            key[1] // 8)
                        for p in range(3))
            tw = TileWriter(fc, hm, wm, qindex, lr=lr, lr_off=(r0, c0),
                            frame_mi=(self.seq.mi_rows, self.seq.mi_cols))
            return tw.encode_inter(t_sizes, t_mv, t_lv, cdef_idx=t_ci,
                                   refs=t_refs, sign_bias=sign_bias,
                                   comp_pair=comp_pair, mvs2=t_mv2,
                                   txty=t_tt, gm=gm, shapes=t_sh,
                                   warp8=t_wp, qmap=t_qm,
                                   delta_q_res=dq_res)

        jobs = [(r01, c01) for r01 in trows for c01 in tcols]
        if len(jobs) > 1:
            # per-tile entropy across host threads (the C coder releases
            # the GIL) — the reference's tile-parallel EC processes
            with ThreadPoolExecutor(max_workers=min(8, len(jobs))) as ex:
                tile = O.assemble_tile_group(
                    list(ex.map(lambda j: code_tile(*j), jobs)))
        else:
            tile = code_tile(*jobs[0])
        hdr = {}
        if meta is not None:
            hdr = {"show_frame": meta["show"],
                   "order_hint": meta["order_hint"],
                   "refresh_frame_flags": meta["refresh"],
                   "ref_frame_idx": meta["ref_idx"],
                   "ref_order_hints": meta["ref_hints"],
                   "reference_select": ref_select}
        else:
            hdr = {"refresh_frame_flags": 0x01}
        if gm:
            gm_types = [0] * 7
            gm_trans = [(0, 0)] * 7
            for rt, mv8g in gm.items():
                gm_types[rt - 1] = 1
                gm_trans[rt - 1] = tuple(int(x) for x in mv8g)
            hdr["gm_types"] = tuple(gm_types)
            hdr["gm_trans"] = tuple(gm_trans)
        mm_on = warp8 is not None
        fp = O.FrameParams(base_q_idx=qindex,
                           delta_q_res=(dq_res if qmap is not None else 0),
                           tile_cols_log2=cfg.tile_columns_log2,
                           tile_rows_log2=cfg.tile_rows_log2,
                           frame_type=O.INTER_FRAME,
                           interp_filter=(self._interp_filt or 0),
                           filter_levels=self._lf_levels(qindex, False),
                           film_grain=self._grain_for(coded_idx),
                           lr_types=_lr_types(lr), lr_uv_shift=1,
                           switchable_motion_mode=mm_on,
                           allow_warped_motion=mm_on,
                           **hdr, **self._cdef_params(qindex))
        payload = (O.temporal_delimiter()
                   + O.write_frame_obu(self.seq, fp, tile))
        recon = None
        if ry is not None:
            recon = Frame(
                ry[: self.seq.height, : self.seq.width].astype(self._px),
                ru[: (self.seq.height + 1) // 2,
                   : (self.seq.width + 1) // 2].astype(self._px),
                rv[: (self.seq.height + 1) // 2,
                   : (self.seq.width + 1) // 2].astype(self._px))
        psnr = _psnr(frame, recon) if (cfg.stat_report and recon) else None
        return Packet(payload, -1, False, recon, psnr, qindex=qindex)

    def _make_packet(self, frame: Frame, dev: dict, qindex: int,
                     meta=None, coded_idx: int = 0) -> Packet:
        cfg = self.cfg
        fc = FrameContext(qindex)
        ibc = self._ibc_by_idx.pop(coded_idx, None)
        cdef_idx = (dev.get("cdef_idx")
                    if cfg.enable_cdef and ibc is None else None)
        lr = None
        if cfg.enable_restoration and ibc is None:
            if meta is not None and "lr" in meta:
                lr = meta["lr"]
                dev = dict(dev)
                (dev["recon_y"], dev["recon_u"],
                 dev["recon_v"]) = meta["lr_planes"]
            else:
                # intra-only path: restore at packet time (no refs)
                pl = [np.array(dev["recon_y"], np.int32),
                      np.array(dev["recon_u"], np.int32),
                      np.array(dev["recon_v"], np.int32)]
                dpl = [np.array(dev[k], np.int32)
                       if dev.get(k) is not None else pl[i].copy()
                       for i, k in enumerate(("deb_y", "deb_u", "deb_v"))]
                lr = self._lr_process(frame, pl, dpl)
                dev = dict(dev)
                dev["recon_y"], dev["recon_u"], dev["recon_v"] = pl
        sizes = dev.get("sizes")
        lv16 = (None if dev.get("levels16_y") is None else
                (dev["levels16_y"], dev["levels16_u"], dev["levels16_v"]))
        tile = None
        if lr is None and ibc is None \
                and cfg.entropy_backend in ("auto", "cpp"):
            from svt_av1_tpu.entropy import backend as native
            if native.available():
                tile = native.encode_tile_cpp(
                    fc, self.seq.mi_rows, self.seq.mi_cols, qindex,
                    dev["modes"].astype(np.uint8), dev["levels_y"],
                    dev["levels_u"], dev["levels_v"], cdef_idx=cdef_idx,
                    angles=dev.get("angles"),
                    uv_modes=dev.get("uv_modes"), cfl=dev.get("cfl"),
                    sizes=sizes, levels16=lv16)
            elif cfg.entropy_backend == "cpp":
                raise RuntimeError("C++ entropy backend unavailable")
        if tile is None:
            tw = TileWriter(fc, self.seq.mi_rows, self.seq.mi_cols, qindex,
                            lr=lr)
            tile = tw.encode(dev["modes"], dev["levels_y"], dev["levels_u"],
                             dev["levels_v"], cdef_idx=cdef_idx,
                             angles=dev.get("angles"),
                             uv_modes=dev.get("uv_modes"),
                             cfl=dev.get("cfl"), sizes=sizes,
                             levels16=lv16, ibc=ibc)
        # intra frames stay single-tile: the wavefront predicts across
        # tile boundaries (tile info is per-frame, so inter frames of the
        # same stream may still tile)
        fp = O.FrameParams(base_q_idx=qindex,
                           tile_cols_log2=0, tile_rows_log2=0,
                           filter_levels=((0, 0, 0, 0) if ibc is not None
                                          else self._lf_levels(qindex,
                                                               True)),
                           order_hint=(0 if meta is None
                                       else meta["order_hint"]),
                           film_grain=self._grain_for(coded_idx),
                           lr_types=_lr_types(lr), lr_uv_shift=1,
                           allow_screen_content=ibc is not None,
                           allow_intrabc=ibc is not None,
                           **self._cdef_params(qindex))
        payload = (O.temporal_delimiter()
                   + O.write_sequence_header(self.seq)
                   + O.write_frame_obu(self.seq, fp, tile))

        recon = None
        if dev["recon_y"] is not None:
            px = np.uint8 if cfg.bit_depth == 8 else np.uint16
            recon = Frame(
                dev["recon_y"][: self.seq.height, : self.seq.width]
                .astype(px),
                dev["recon_u"][: (self.seq.height + 1) // 2,
                               : (self.seq.width + 1) // 2].astype(px),
                dev["recon_v"][: (self.seq.height + 1) // 2,
                               : (self.seq.width + 1) // 2].astype(px))
        psnr = (_psnr(frame, recon, cfg.bit_depth)
                if (cfg.stat_report and recon) else None)
        return Packet(payload, -1, True, recon, psnr, qindex=qindex)

    def _grain_for(self, n: int):
        """Per-frame film grain params: the seed advances 3381 per coded
        frame (ref EbPictureDecisionProcess.c film-grain seed update) so
        the pattern is not temporally static; 0 is avoided (update_grain
        always 1 here)."""
        if self._grain is None:
            return None
        s = (self._grain.random_seed + 3381 * n) & 0xFFFF
        return dataclasses.replace(self._grain, random_seed=s or 7391)

    def _need_recon(self) -> bool:
        return (self.cfg.recon_output or self.cfg.stat_report
                or self.cfg.enable_restoration)

    def _cdef_params(self, qindex: int) -> dict:
        if not self.cfg.enable_cdef:
            return {}
        from svt_av1_tpu.ops import cdef as CDEF
        return {"cdef_damping": CDEF.pick_damping(qindex),
                "cdef_bits": CDEF.CDEF_BITS,
                "cdef_y_strengths": CDEF.Y_STRENGTHS,
                "cdef_uv_strengths": CDEF.UV_STRENGTHS}

    def _lf_levels(self, qindex: int, is_key: bool) -> tuple:
        if not self.cfg.enable_deblocking:
            return (0, 0, 0, 0)
        from svt_av1_tpu.ops import deblock as DB
        ly, lu, lv = DB.pick_filter_levels(qindex, is_key)
        return (ly, ly, lu, lv)

    def _refill(self) -> None:
        if not self._packets:
            if not self._pending and self._inbox:
                self._dispatch_inbox()  # flush a partial batch
            if self._pending:
                self._finish_one()

    # -- ref eb_svt_get_packet ----------------------------------------------------
    def get_packet(self) -> Optional[Packet]:
        self._refill()
        return self._packets.pop(0) if self._packets else None

    # -- ref eb_svt_get_recon ------------------------------------------------------
    def get_recon(self) -> Optional[Frame]:
        self._refill()
        return self._packets[0].recon if self._packets else None

    def encode_all(self, frames) -> Iterator[Packet]:
        """Convenience: push frames, yield packets in decode order
        (hier-B buffers mini-GOPs, so packets may lag sends)."""
        for f in frames:
            self.send_picture(f)
            while True:
                pkt = self.get_packet()
                if pkt is None:
                    break
                yield pkt
        self.flush()
        while True:
            pkt = self.get_packet()
            if pkt is None:
                break
            yield pkt


def _unpack_levels(packed: np.ndarray, bs: int) -> np.ndarray:
    """Inverse of the device's per-cell tile packing: [nb8h, nb8w, t, t]
    -> [gh, gw, bs*t/8, bs*t/8] leaf grids for leaf size bs (cells whose
    selected size differs hold other leaves' tiles — the tile writers
    only read matching cells)."""
    nb8h, nb8w, t, _ = packed.shape
    k = bs // 8
    gh, gw = nb8h // k, nb8w // k
    return (packed.astype(np.int32)
            .reshape(gh, k, gw, k, t, t).transpose(0, 2, 1, 4, 3, 5)
            .reshape(gh, gw, k * t, k * t))


def _unpack_levels_rect(packed: np.ndarray, kh: int, kw: int) -> np.ndarray:
    """Rect-leaf twin of _unpack_levels: [nb8h, nb8w, t, t] cell tiles
    -> [GH, GW, kh*t, kw*t] rect-leaf grids (kh/kw = leaf extent in 8px
    cells; t = 8 luma / 4 chroma, so the stitched dims are the rect tx
    dims at that plane's subsampling)."""
    nb8h, nb8w, t, _ = packed.shape
    gh, gw = nb8h // kh, nb8w // kw
    return (packed.astype(np.int32)
            .reshape(gh, kh, gw, kw, t, t).transpose(0, 2, 1, 4, 3, 5)
            .reshape(gh, gw, kh * t, kw * t))


def _lr_types(lr) -> tuple:
    """FrameParams.lr_types from a per-plane lr list (None -> NONE)."""
    if lr is None:
        return (0, 0, 0)
    return tuple(0 if pl is None else pl["type"] for pl in lr)


def _unblock_dev(blocks):
    """[nbh, nbw, bs, bs] device block grid -> [H, W] device plane."""
    nbh, nbw, bs, _ = blocks.shape
    return blocks.transpose(0, 2, 1, 3).reshape(nbh * bs, nbw * bs)


import functools


@functools.lru_cache(maxsize=8)
def _split_planes(ph32: int, pw32: int, dtype_name: str):
    """Jitted splitter for _upload_src's one-buffer frame transfer."""
    import jax
    ny = ph32 * pw32
    nc = ny // 4

    @jax.jit
    def split(buf):
        return (buf[:ny].reshape(ph32, pw32),
                buf[ny : ny + nc].reshape(ph32 // 2, pw32 // 2),
                buf[ny + nc :].reshape(ph32 // 2, pw32 // 2))

    return split


@functools.lru_cache(maxsize=64)
def _fetch_packer(entries: tuple):
    """Jitted device-side byte packer for _fetch_inter_arrs: bitcast
    every output to uint8 (with per-field shrinkers: quarter-pel int8
    MVs, bit-packed bool maps) and concatenate — one array to fetch
    instead of ~10 (the tunnel costs ~18 ms per round trip AND runs at
    ~10 MB/s, so both count and bytes matter)."""
    import jax
    import jax.numpy as jnp

    def pack(*arrs):
        flat = []
        for a, (_i, shp, _dt, tag) in zip(arrs, entries):
            if a.shape[:1] != tuple(shp[:1]) and a.ndim >= 1:
                a = a[: shp[0]]              # sparse-row cap
            if tag == "mvq":
                a = (a.astype(jnp.int32) // 2).astype(jnp.int8)
                a = jax.lax.bitcast_convert_type(a, jnp.uint8)
            elif tag == "bits":
                v = a.reshape(-1).astype(jnp.uint8)
                pad = (-v.size) % 8
                if pad:
                    v = jnp.concatenate([v, jnp.zeros(pad, jnp.uint8)])
                w = jnp.array([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
                a = (v.reshape(-1, 8) * w).sum(1).astype(jnp.uint8)
            elif a.dtype == jnp.bool_:
                a = a.astype(jnp.uint8)
            if a.dtype != jnp.uint8:
                a = jax.lax.bitcast_convert_type(a, jnp.uint8)
            flat.append(a.reshape(-1))
        return jnp.concatenate(flat)

    return jax.jit(pack)


@functools.lru_cache(maxsize=4)
def _inter_postproc_fn(ph: int, pw: int, cdef: bool, bd: int = 8):
    """Jitted inter in-loop postproc for the warped-motion path: the
    host patches WARPED_CAUSAL blocks into the pre-filter recon, then
    this step deblocks (per-direction tx extents from the leaf maps)
    and runs the CDEF search+apply — the same filter code the normal
    P step fuses in-line (p_frame_step filters section).

    f(y, u, v, src_y, src_u, src_v, sk8, szw8, szh8, lf_y, lf_u, lf_v,
      damping) -> (y, u, v, cdef_idx_sb); planes at mi-grid dims.
    """
    import jax
    import jax.numpy as jnp
    from svt_av1_tpu.ops import cdef as CDEF
    from svt_av1_tpu.ops import deblock as DB

    px = jnp.uint8 if bd == 8 else jnp.uint16

    def f(y, u, v, sy, su, sv, sk8, szw8, szh8, ly, lu, lv, damping):
        y = y.astype(jnp.int32)
        u = u.astype(jnp.int32)
        v = v.astype(jnp.int32)
        upy = lambda a: jnp.repeat(jnp.repeat(a, 8, 0), 8, 1)
        upc = lambda a: jnp.repeat(jnp.repeat(a >> 1, 4, 0), 4, 1)
        y = DB.deblock_plane(jnp, y, upy(szw8), ly, ly, True, bd=bd,
                             sizes_px_h=upy(szh8))
        u = DB.deblock_plane(jnp, u, upc(szw8), lu, lu, False, bd=bd,
                             sizes_px_h=upc(szh8))
        v = DB.deblock_plane(jnp, v, upc(szw8), lv, lv, False, bd=bd,
                             sizes_px_h=upc(szh8))
        idx_sb = jnp.zeros((-(-ph // 64), -(-pw // 64)), jnp.uint8)
        if cdef:
            (y, u, v), idx_sb = CDEF.cdef_search_and_apply(
                jnp, (y, u, v),
                (sy.astype(jnp.int32), su.astype(jnp.int32),
                 sv.astype(jnp.int32)), sk8, damping,
                coeff_shift=bd - 8)
            idx_sb = idx_sb.astype(jnp.uint8)
        return y.astype(px), u.astype(px), v.astype(px), idx_sb

    return jax.jit(f)


@functools.lru_cache(maxsize=8)
def _intra_postproc_fn(ph: int, pw: int, batched: bool, cdef: bool,
                       bd: int = 8, part16: bool = False,
                       lr: bool = False):
    """Jitted keyframe in-loop postproc: deblock (8x8/4x4 tx grid, or a
    per-cell 8/16 size map at the RD presets) then optional CDEF
    search+apply; levels are runtime scalars so rate control never
    recompiles.

    f(y, u, v, src_y, src_u, src_v, skip_cells [, sizes8],
      lf_y, lf_u, lf_v, damping) -> (y, u, v, cdef_idx_sb[, deb_y,
      deb_u, deb_v]) — the trailing deblocked (pre-CDEF) planes feed the
    loop-restoration stripe context (spec save_deblock_boundary_lines).
    """
    import jax
    import jax.numpy as jnp
    from svt_av1_tpu.ops import cdef as CDEF
    from svt_av1_tpu.ops import deblock as DB

    sizes_y = np.full((ph, pw), 8, np.int32)
    sizes_c = np.full((ph // 2, pw // 2), 4, np.int32)

    px = jnp.uint8 if bd == 8 else jnp.uint16

    def f(y, u, v, sy, su, sv, sk, sizes8, ly, lu, lv, damping):
        if part16:
            # per-pixel tx size maps from the per-8px-cell size map
            rep = lambda a, k: jnp.repeat(jnp.repeat(a, k, 0), k, 1)
            sz_y = rep(sizes8.astype(jnp.int32), 8)[:ph, :pw]
            sz_c = rep((sizes8 // 2).astype(jnp.int32),
                       4)[: ph // 2, : pw // 2]
        else:
            sz_y, sz_c = jnp.asarray(sizes_y), jnp.asarray(sizes_c)
        y = DB.deblock_plane(jnp, y.astype(jnp.int32), sz_y,
                             ly, ly, True, bd=bd)
        u = DB.deblock_plane(jnp, u.astype(jnp.int32), sz_c,
                             lu, lu, False, bd=bd)
        v = DB.deblock_plane(jnp, v.astype(jnp.int32), sz_c,
                             lv, lv, False, bd=bd)
        deb = (y.astype(px), u.astype(px), v.astype(px)) if lr else ()
        idx_sb = jnp.zeros((-(-ph // 64), -(-pw // 64)), jnp.uint8)
        if cdef:
            (y, u, v), idx_sb = CDEF.cdef_search_and_apply(
                jnp, (y, u, v),
                (sy.astype(jnp.int32), su.astype(jnp.int32),
                 sv.astype(jnp.int32)), sk, damping,
                coeff_shift=bd - 8)
            idx_sb = idx_sb.astype(jnp.uint8)
        return (y.astype(px), u.astype(px), v.astype(px), idx_sb) + deb

    if not part16:
        g = lambda y, u, v, sy, su, sv, sk, ly, lu, lv, damping: f(
            y, u, v, sy, su, sv, sk, None, ly, lu, lv, damping)
        nin = 7
    else:
        g, nin = f, 8
    if batched:
        g = jax.vmap(g, in_axes=(0,) * nin + (None,) * 4)
    return jax.jit(g, static_argnames=())


def _qp_to_qindex(qp: int) -> int:
    """Map 0..63 QP to 0..255 qindex (ref qp_scale semantics: ~4x)."""
    return min(255, max(1, qp * 4))


def _psnr(src: Frame, rec: Frame, bd: int = 8) -> tuple:
    peak = float((1 << bd) - 1)

    def p(a, b):
        mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
        return 99.0 if mse == 0 else 10 * np.log10(peak**2 / mse)

    return (p(src.y, rec.y), p(src.u, rec.u), p(src.v, rec.v))


# --- functional aliases matching the reference API names ---------------------

def eb_init_handle(config: EncoderConfig) -> Encoder:
    return Encoder(config)


def eb_svt_enc_set_parameter(handle: Encoder, **kw) -> None:
    handle.cfg = handle.cfg.replace(**kw)


def eb_svt_enc_send_picture(handle: Encoder, frame: Frame) -> None:
    handle.send_picture(frame)


def eb_svt_get_packet(handle: Encoder) -> Optional[Packet]:
    return handle.get_packet()


def eb_svt_get_recon(handle: Encoder) -> Optional[Frame]:
    return handle.get_recon()
