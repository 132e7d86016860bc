"""IVF/OBU -> frames decoder (v1 subset: intra keyframes, single tile).

Shares ALL context/symbol rules with the encoder via entropy.syntax and
pipeline.tile helpers; prediction/dequant/inverse-transform use the numpy
twins of the device ops — so decoded recon must equal encoder recon
bit-for-bit (asserted in e2e tests).
"""

from __future__ import annotations

import numpy as np

from svt_av1_tpu.entropy import mvp as MVP
from svt_av1_tpu.entropy import obu as O
from svt_av1_tpu.entropy import syntax as S
from svt_av1_tpu.entropy.cdf_model import FrameContext, update_icdf
from svt_av1_tpu.entropy.range_coder import RangeDecoder
from svt_av1_tpu.io.ivf import IvfReader
from svt_av1_tpu.io.yuv import Frame
from svt_av1_tpu.ops import cdef as CD
from svt_av1_tpu.ops import intra
from svt_av1_tpu.ops import mc as MC
from svt_av1_tpu.ops import quant as Q
from svt_av1_tpu.ops import transforms as T

# intra chroma tx derivation (spec Mode_To_Txfm_Type via compute_tx_type)
_UV_TX = {0: 0, 1: 1, 2: 2, 9: 3, 13: 0}  # DC->DCT, V->ADST_DCT, H->DCT_ADST,
                                   # SMOOTH->ADST_ADST
from svt_av1_tpu.pipeline.inter_encoder import PAD, SEARCH_RANGE
from svt_av1_tpu.pipeline.tile import (LEAF_MI, SB_MI, read_partition_symbol)
from svt_av1_tpu.utils.bits import BitReader


class Decoder:
    def __init__(self) -> None:
        self.seq: O.SequenceParams | None = None
        # 8 reference slots of decoded padded planes (spec ref frame store)
        self.ref_slots: list = [None] * 8
        self.ref_order_hints = [0] * 8   # RefOrderHint per slot
        self.ref_grain = [None] * 8      # RefGrainParams per slot

    # -- containers -------------------------------------------------------------
    def decode_ivf(self, fh) -> list[Frame]:
        reader = IvfReader(fh)
        out = [self.decode_temporal_unit(payload)
               for _, payload in reader.frames()]
        return [f for f in out if f is not None]

    def decode_temporal_unit(self, data: bytes):
        """Returns the shown Frame, or None for a no-show coded frame
        (hier-B: its display comes later via show_existing_frame)."""
        frame = None
        saw_frame = False
        for obu_type, payload in O.split_obus(data):
            if obu_type == O.OBU_TEMPORAL_DELIMITER:
                continue
            if obu_type == O.OBU_SEQUENCE_HEADER:
                self.seq = O.parse_sequence_header(payload)
            elif obu_type == O.OBU_FRAME:
                assert self.seq is not None, "no sequence header seen"
                frame = self._decode_frame(payload)
                saw_frame = True
            elif obu_type == O.OBU_FRAME_HEADER:
                hdr = O.parse_frame_header_bits(
                    BitReader(payload), self.seq, self.ref_order_hints)
                assert isinstance(hdr, O.ShowExisting), \
                    "standalone non-show-existing frame headers unsupported"
                stored = self.ref_slots[hdr.slot]
                assert stored is not None, "show_existing of empty slot"
                frame = self._output_frame(stored,
                                           self.ref_grain[hdr.slot])
                saw_frame = True
        assert saw_frame, "no frame in temporal unit"
        return frame

    def _output_frame(self, planes, grain=None) -> Frame:
        sp = self.seq
        px = np.uint8 if sp.bit_depth == 8 else np.uint16
        y = planes[0][: sp.height, : sp.width].astype(px)
        ch, cw = (sp.height + 1) // 2, (sp.width + 1) // 2
        u = planes[1][:ch, :cw].astype(px)
        v = planes[2][:ch, :cw].astype(px)
        if grain is not None and grain.apply_grain:
            # film grain is output-only (spec 7.18.3): references and
            # coding recon stay grain-free
            from svt_av1_tpu.ops.film_grain import apply_grain
            y, u, v = apply_grain(grain, y, u, v, bit_depth=sp.bit_depth)
        return Frame(y, u, v)

    # -- frame ------------------------------------------------------------------
    def _decode_frame(self, payload: bytes):
        sp = self.seq
        r = BitReader(payload)
        fp = O.parse_frame_header_bits(r, sp, self.ref_order_hints)
        assert not isinstance(fp, O.ShowExisting), \
            "show_existing inside OBU_FRAME"
        r.byte_align()
        tile_data = payload[r.byte_offset():]

        mi_rows, mi_cols = sp.mi_rows, sp.mi_cols
        ph, pw = mi_rows * 4, mi_cols * 4
        self.rec = [np.zeros((ph, pw), np.int32),
                    np.zeros((ph // 2, pw // 2), np.int32),
                    np.zeros((ph // 2, pw // 2), np.int32)]
        self.fp = fp
        self.is_inter_frame = not fp.is_intra
        # frame-level maps assembled from per-tile contexts (in-loop
        # filters run frame-wide across tile boundaries, spec 7.14)
        self.skip_map = np.zeros((mi_rows, mi_cols), np.uint8)
        self.w4_map = np.zeros((mi_rows, mi_cols), np.uint8)
        self.h4_map = np.zeros((mi_rows, mi_cols), np.uint8)
        if self.is_inter_frame:
            self.mi = MVP.MiInter(mi_rows, mi_cols)
            self.sign_bias = O.ref_sign_biases(sp, fp.order_hint,
                                               fp.ref_order_hints)
            # warped motion: references cropped to true frame dims (the
            # warp filter clamps at RefWidth-1/RefHeight-1, spec 7.11.3.5)
            self.warp_on = bool(fp.switchable_motion_mode)
            ch, cw = (sp.height + 1) // 2, (sp.width + 1) // 2
            self.warp_refs = {
                slot: (self.ref_slots[slot][0][: sp.height, : sp.width],
                       self.ref_slots[slot][1][:ch, :cw],
                       self.ref_slots[slot][2][:ch, :cw])
                for slot in set(fp.ref_frame_idx)
                if self.ref_slots[slot] is not None}
            # subpel phase banks per distinct referenced slot (must mirror
            # the encoder's MC exactly: pipeline.inter_encoder
            # _mc_luma/_mc_chroma).  The encoder runs on 32-padded planes;
            # edge-pad the reference the same way first so both sides
            # filter identical arrays.
            ph32, pw32 = -(-ph // 32) * 32, -(-pw // 32) * 32

            def pad32(p, shift):
                return np.pad(p, ((0, (ph32 >> shift) - p.shape[0]),
                                  (0, (pw32 >> shift) - p.shape[1])),
                              mode="edge")

            cpad = PAD // 2 + 1
            self.banks = {}       # slot -> (bank_y, bank_u, bank_v)
            self.planes_pad = {}  # slot -> full-pel padded (compound jnt)
            for slot in set(fp.ref_frame_idx):
                ref = self.ref_slots[slot]
                assert ref is not None, f"missing reference in slot {slot}"
                py = MC.pad_for_filter(np, pad32(ref[0], 0), PAD)
                pu = MC.pad_for_filter(np, pad32(ref[1], 1), cpad)
                pv = MC.pad_for_filter(np, pad32(ref[2], 1), cpad)
                self.planes_pad[slot] = (py, pu, pv)
                bd = sp.bit_depth
                filt = fp.interp_filter
                self.banks[slot] = (MC.phase_bank(np, py, 4, bd, filt),
                                    MC.phase_bank(np, pu, 2, bd, filt),
                                    MC.phase_bank(np, pv, 2, bd, filt))

        self.cdef_idx_map = np.zeros((-(-mi_rows // SB_MI),
                                      -(-mi_cols // SB_MI)), np.int32)

        # ---- loop restoration state (per-plane Wiener/SGR; spec 5.11.57)
        self.lr = None
        if sp.enable_restoration and any(t in (2, 3) for t in fp.lr_types):
            from svt_av1_tpu.ops import restoration as LRR
            planes = []
            for p in range(3):
                if fp.lr_types[p] not in (2, 3):
                    planes.append(None)
                    continue
                unit = (64 << fp.lr_unit_shift) >> (fp.lr_uv_shift
                                                    if p else 0)
                h = sp.height if p == 0 else (sp.height + 1) // 2
                w = sp.width if p == 0 else (sp.width + 1) // 2
                nr = len(LRR.ru_grid(h, unit))
                nc = len(LRR.ru_grid(w, unit))
                planes.append({"unit": unit, "type": fp.lr_types[p],
                               "use": np.zeros((nr, nc), bool),
                               "taps": np.zeros((nr, nc, 6), np.int32),
                               "ep": np.zeros((nr, nc), np.int32),
                               "xqd": np.zeros((nr, nc, 2), np.int32)})
            self.lr = planes

        # ---- tiles (spec tile_group_obu; uniform spacing) ----------------
        trows, tcols = O.tile_starts(sp, fp.tile_cols_log2,
                                     fp.tile_rows_log2)
        n_tiles = len(trows) * len(tcols)
        if n_tiles > 1:
            # tile_start_and_end_present_flag (0) + byte alignment
            assert tile_data[0] == 0
            tile_data = tile_data[1:]
        pos = 0
        idx = 0
        for r01 in trows:
            for c01 in tcols:
                if idx + 1 < n_tiles:
                    sz = int.from_bytes(tile_data[pos : pos + 4],
                                        "little") + 1
                    pos += 4
                    td = tile_data[pos : pos + sz]
                    pos += sz
                else:
                    td = tile_data[pos:]
                self._decode_tile(td, r01, c01)
                idx += 1

        # ---- in-loop filters (must mirror the encoder exactly) ----------
        if any(fp.filter_levels):
            from svt_av1_tpu.ops import deblock as DB
            l0, l1, lu2, lv2 = fp.filter_levels
            # per-pixel tx-size maps from the coded block sizes (intra
            # frames fill w4_map in _block; uniform-8 streams are all 2s)
            w4 = np.maximum(self.w4_map.astype(np.int32), 2)
            h4 = np.maximum(self.h4_map.astype(np.int32), 2)
            upy = lambda a: np.repeat(np.repeat(a, 4, 0), 4, 1) * 4
            upc = lambda a: np.repeat(np.repeat(a, 2, 0), 2, 1) * 2
            self.rec[0] = DB.deblock_plane(np, self.rec[0], upy(w4), l0, l1,
                                           True, bd=sp.bit_depth,
                                           sizes_px_h=upy(h4))
            self.rec[1] = DB.deblock_plane(np, self.rec[1], upc(w4), lu2,
                                           lu2, False, bd=sp.bit_depth,
                                           sizes_px_h=upc(h4))
            self.rec[2] = DB.deblock_plane(np, self.rec[2], upc(w4), lv2,
                                           lv2, False, bd=sp.bit_depth,
                                           sizes_px_h=upc(h4))

        # LR stripe context rows come from the DEBLOCKED (pre-CDEF)
        # frame (spec save_deblock_boundary_lines; ref EbCdefProcess.c
        # :545-558 saves them before CDEF runs)
        deb = ([pl.copy() for pl in self.rec]
               if self.lr is not None else None)

        if sp.enable_cdef and not fp.allow_intrabc:
            skip8 = self.skip_map[::2, ::2].astype(bool)
            planes = CD.cdef_frame(
                np, tuple(self.rec), skip8, self.cdef_idx_map,
                fp.cdef_damping, fp.cdef_y_strengths, fp.cdef_uv_strengths,
                coeff_shift=sp.bit_depth - 8)
            self.rec = [np.asarray(pl) for pl in planes]

        if self.lr is not None:
            from svt_av1_tpu.ops import restoration as LRR
            for p in range(3):
                pl = self.lr[p]
                if pl is None or not pl["use"].any():
                    continue
                ss = 0 if p == 0 else 1
                h = sp.height if p == 0 else (sp.height + 1) // 2
                w = sp.width if p == 0 else (sp.width + 1) // 2
                sub = np.ascontiguousarray(self.rec[p][:h, :w])
                dsub = np.ascontiguousarray(deb[p][:h, :w])
                if pl["type"] == 3:
                    out = LRR.apply_sgr_plane(sub, dsub, pl["unit"], ss,
                                              pl["use"], pl["ep"],
                                              pl["xqd"], sp.bit_depth)
                else:
                    out = LRR.apply_wiener_plane(sub, dsub, pl["unit"],
                                                 ss, pl["use"],
                                                 pl["taps"],
                                                 sp.bit_depth)
                self.rec[p][:h, :w] = out

        # reference update (spec decode_frame_wrapup refresh)
        planes = tuple(p.copy() for p in self.rec)
        for slot in range(8):
            if (fp.refresh_frame_flags >> slot) & 1:
                self.ref_slots[slot] = planes
                self.ref_order_hints[slot] = fp.order_hint
                self.ref_grain[slot] = fp.film_grain

        if not fp.show_frame:
            return None
        return self._output_frame(self.rec, fp.film_grain)

    def _decode_tile(self, td: bytes, r01, c01) -> None:
        """Decode one tile with tile-local contexts (spec decode_tile);
        recon writes are offset by the tile origin."""
        r0, r1 = r01
        c0, c1 = c01
        hm, wm = r1 - r0, c1 - c0
        self.toff = (r0, c0)
        self.fc = FrameContext(self.fp.base_q_idx)
        self.tc = S.TileContexts(hm, wm)
        if self.is_inter_frame or self.fp.allow_intrabc:
            self.mi = MVP.MiInter(hm, wm)
        self.dec = RangeDecoder(td)
        # per-tile per-plane wiener/sgrproj tap references (spec
        # decode_tile resets RefLrWiener/RefSgrXqd at tile start)
        self._lr_ref = [list(S.WIENER_MID) * 2 for _ in range(3)]
        self._sgr_ref = [list(S.SGR_XQD_MID) for _ in range(3)]
        self._cur_q = self.fp.base_q_idx
        for r4 in range(0, hm, SB_MI):
            for c4 in range(0, wm, SB_MI):
                self._cdef_done = False
                self._dq_done = False
                self._read_lr(r4 + r0, c4 + c0)
                self._partition(r4, c4, SB_MI)
        self.skip_map[r0:r1, c0:c1] = self.tc.skips
        if self.is_inter_frame:
            self.w4_map[r0:r1, c0:c1] = self.mi.w4
            self.h4_map[r0:r1, c0:c1] = self.mi.h4

    def _read_lr(self, r4: int, c4: int) -> None:
        """Mirror of TileWriter._write_lr (spec read_lr; per-plane
        WIENER or SGRPROJ frame types)."""
        if self.lr is None:
            return
        mi_rows, mi_cols = self.seq.mi_rows, self.seq.mi_cols
        for p in range(3):
            pl = self.lr[p]
            if pl is None:
                continue
            ss = 0 if p == 0 else 1
            unit = pl["unit"]
            use, taps = pl["use"], pl["taps"]
            sgr = pl["type"] == 3
            py0 = (r4 * 4) >> ss
            py1 = min((r4 + SB_MI) * 4, mi_rows * 4) >> ss
            px0 = (c4 * 4) >> ss
            px1 = min((c4 + SB_MI) * 4, mi_cols * 4) >> ss
            nr, nc = use.shape
            for ur in range(-(-py0 // unit), min(nr, -(-py1 // unit))):
                for uc in range(-(-px0 // unit), min(nc, -(-px1 // unit))):
                    if sgr:
                        on = S._code_bin(None, self.dec,
                                         self.fc.sgrproj_restore)
                        if on:
                            ep, xqd = S.code_sgr_filter(None, self.dec,
                                                        self._sgr_ref[p])
                            self._sgr_ref[p] = list(xqd)
                            use[ur, uc] = True
                            pl["ep"][ur, uc] = ep
                            pl["xqd"][ur, uc] = xqd
                        continue
                    on = S._code_bin(None, self.dec,
                                     self.fc.wiener_restore)
                    if on:
                        t = S.code_wiener_filter(None, self.dec,
                                                 self._lr_ref[p])
                        self._lr_ref[p] = list(t)
                        use[ur, uc] = True
                        taps[ur, uc] = t[3:] + t[:3]   # store (h, v)

    def _read_cdef(self, r4: int, c4: int, skip: int) -> None:
        """Mirror of TileWriter._write_cdef (spec read_cdef)."""
        if not self.seq.enable_cdef or self._cdef_done or skip \
                or self.fp.allow_intrabc:
            return
        idx = 0
        for _ in range(self.fp.cdef_bits):
            idx = (idx << 1) | self.dec.decode_bool(16384)
        self.cdef_idx_map[(r4 + self.toff[0]) // SB_MI,
                          (c4 + self.toff[1]) // SB_MI] = idx
        self._cdef_done = True

    def _read_delta_q(self, r4: int, c4: int, w4: int, h4: int,
                      skip: int) -> None:
        """Mirror of TileWriter._write_delta_q (spec
        read_delta_qindex): updates CurrentQIndex at each SB's first
        block; an SB-sized skip block carries no delta.  Gated on the
        present FLAG, not the res value — present=1 with res=0 is
        spec-legal (step 1) and must still consume the symbol."""
        if not self.fp.delta_q_on or self._dq_done:
            return
        if (r4 % SB_MI) or (c4 % SB_MI):
            return
        self._dq_done = True
        if w4 == SB_MI and h4 == SB_MI and skip:
            return
        delta = S.code_delta_q(None, self.dec, self.fc)
        self._cur_q = int(np.clip(
            self._cur_q + (delta << self.fp.delta_q_res), 1, 255))

    def _block_q(self) -> int:
        """qindex for the current block's dequant: CurrentQIndex when
        the frame codes per-SB delta-q, else the frame base."""
        return (self._cur_q if self.fp.delta_q_on
                else self.fp.base_q_idx)

    def _partition(self, r4: int, c4: int, n4: int) -> None:
        tc = self.tc
        if r4 >= tc.mi_rows or c4 >= tc.mi_cols:
            return
        if n4 == LEAF_MI:
            p = read_partition_symbol(self.dec, self.fc, tc, r4, c4, n4)
            assert p == S.PARTITION_NONE, f"unsupported partition {p} at 8x8"
            if self.is_inter_frame:
                self._inter_block(r4, c4, 2, 2)
            else:
                self._block(r4, c4)
            return
        p = read_partition_symbol(self.dec, self.fc, tc, r4, c4, n4)
        if p == S.PARTITION_NONE:
            if self.is_inter_frame:
                assert n4 in (4, 8, 16), \
                    f"unsupported PARTITION_NONE at n4={n4}"
                self._inter_block(r4, c4, n4, n4)
            else:
                assert n4 == 4, f"unsupported intra PARTITION_NONE {n4}"
                self._block(r4, c4, 16)
            return
        if p in (S.PARTITION_HORZ, S.PARTITION_VERT):
            assert self.is_inter_frame and n4 in (4, 8), \
                f"unsupported partition {p} at n4={n4}"
            half = n4 >> 1
            if p == S.PARTITION_HORZ:
                self._inter_block(r4, c4, n4, half)
                self._inter_block(r4 + half, c4, n4, half)
            else:
                self._inter_block(r4, c4, half, n4)
                self._inter_block(r4, c4 + half, half, n4)
            return
        assert p == S.PARTITION_SPLIT, \
            f"unsupported partition {p} at n4={n4}"
        half = n4 >> 1
        self._partition(r4, c4, half)
        self._partition(r4, c4 + half, half)
        self._partition(r4 + half, c4, half)
        self._partition(r4 + half, c4 + half, half)

    _TX_OF = {8: T.TX_8X8, 16: T.TX_16X16, 32: T.TX_32X32,
              64: T.TX_64X64}
    _TX_OF_C = {8: T.TX_4X4, 16: T.TX_8X8, 32: T.TX_16X16, 64: T.TX_32X32}
    # rect leaf transforms keyed (bh, bw) in pixels (mirror of
    # TileWriter._TX_RECT)
    _TX_RECT = {(8, 16): T.TX_16X8, (16, 8): T.TX_8X16,
                (16, 32): T.TX_32X16, (32, 16): T.TX_16X32}
    _TX_RECT_C = {(8, 16): T.TX_8X4, (16, 8): T.TX_4X8,
                  (16, 32): T.TX_16X8, (32, 16): T.TX_8X16}

    def _inter_block(self, r4: int, c4: int, w4: int, h4: int) -> None:
        dec, fc, tc, mi = self.dec, self.fc, self.tc, self.mi
        bw, bh = w4 * 4, h4 * 4
        if w4 == h4:
            tx_y, tx_c = self._TX_OF[bw], self._TX_OF_C[bw]
        else:
            tx_y = self._TX_RECT[(bh, bw)]
            tx_c = self._TX_RECT_C[(bh, bw)]

        ctx = tc.skip_ctx(r4, c4)
        cdf = fc.skip[ctx]
        skip = dec.decode_symbol(cdf, 2)
        update_icdf(cdf, skip, 2)
        self._read_cdef(r4, c4, skip)
        self._read_delta_q(r4, c4, w4, h4, skip)

        is_inter = S.code_is_inter(None, dec, fc, mi, tc, r4, c4)
        assert is_inter, "intra blocks in inter frames not yet supported"
        is_comp = False
        if self.fp.reference_select:
            is_comp = bool(S.code_comp_inter(None, dec, fc, mi, tc, r4, c4))
        counts = S.neighbor_ref_counts(mi, tc, r4, c4)
        mv8b = None
        if is_comp:
            rf = S.code_comp_refs(None, dec, fc, mi, tc, counts, r4, c4)
            res = MVP.find_mv_stack_comp(mi, r4, c4, w4, h4, rf,
                                         sign_bias=self.sign_bias)
            mode = S.code_compound_mode(None, dec, fc, res)
            if mode == S.NEW_NEWMV:
                ref_mv_idx = S.code_drl_idx(None, dec, fc, res, mode)
                pmv0 = MVP.lower_mv_precision(res.stack[ref_mv_idx][0][0])
                pmv1 = MVP.lower_mv_precision(res.stack[ref_mv_idx][0][1])
                mv8 = S.code_mv(None, dec, fc, pmv0)
                mv8b = S.code_mv(None, dec, fc, pmv1)
            elif mode == S.NEAREST_NEARESTMV:
                mv8 = MVP.lower_mv_precision(res.stack[0][0][0])
                mv8b = MVP.lower_mv_precision(res.stack[0][0][1])
            else:
                raise AssertionError(f"unsupported compound mode {mode}")
            ref, ref2 = rf
        else:
            ref = S.code_single_ref(None, dec, fc, counts)
            ref2 = MVP.NONE_FRAME
            gmv = (self.fp.gm_trans[ref - 1]
                   if self.fp.gm_types[ref - 1] else (0, 0))
            res = MVP.find_mv_stack(mi, r4, c4, w4, h4, ref,
                                    sign_bias=self.sign_bias,
                                    global_mv=gmv)
            mode = S.code_inter_mode(None, dec, fc, res)
            if mode in (S.NEWMV, S.NEARMV):
                ref_mv_idx = S.code_drl_idx(None, dec, fc, res, mode)
            else:
                ref_mv_idx = 0
            if mode == S.NEWMV:
                pred_mv = MVP.lower_mv_precision(res.stack[ref_mv_idx][0])
                mv8 = S.code_mv(None, dec, fc, pred_mv)
            elif mode == S.NEARESTMV:
                mv8 = MVP.lower_mv_precision(res.stack[0][0])
            elif mode == S.NEARMV:
                mv8 = MVP.lower_mv_precision(res.stack[ref_mv_idx + 1][0])
            else:
                mv8 = res.global_mv
        bank_y, bank_u, bank_v = self.banks[self.fp.ref_frame_idx[ref - 1]]

        # motion_mode (spec read_motion_mode) — parsed BEFORE this
        # block enters the mi grid; warp params are derived from the
        # causal neighbors' motion field (ops.warp + warp_samples,
        # shared verbatim with the tile writer / encoder warp pass)
        warp_model = None
        if (not is_comp and getattr(self, "warp_on", False)):
            from svt_av1_tpu.entropy import warp_samples as WS
            from svt_av1_tpu.ops import warp as WP
            kind, _ns = WS.motion_mode_gate(mi, tc.mi_rows, tc.mi_cols,
                                            r4, c4, w4, h4, ref, False)
            if kind:
                mm = S.code_motion_mode(None, dec, fc,
                                        S.block_size_of(w4, h4), kind)
                assert mm != WS.OBMC_CAUSAL, "OBMC not produced"
                if mm == WS.WARPED_CAUSAL:
                    pts1, pts2 = WS.find_samples(mi, tc.mi_rows,
                                                 tc.mi_cols, r4, c4,
                                                 w4, h4, ref)
                    pts1, pts2 = WS.select_samples(mv8, pts1, pts2,
                                                   bw, bh)
                    warp_model = WP.derive_warp(
                        pts1, pts2, bw, bh, mv8,
                        r4 + self.toff[0], c4 + self.toff[1])
                    assert warp_model is not None, \
                        "WARPED_CAUSAL with invalid projection"

        tc.set_block(r4, c4, w4, h4, S.block_size_of(w4, h4), S.DC_PRED,
                     skip)
        mi.set_block(r4, c4, w4, h4, is_inter=True, ref_frame=ref,
                     mode=mode, mv=mv8, ref_frame2=ref2,
                     mv2=mv8b if mv8b is not None else (0, 0))

        lim = SEARCH_RANGE * 8 + 6
        for m in ([mv8, mv8b] if mv8b is not None else [mv8]):
            assert m[0] % 2 == 0 and m[1] % 2 == 0, \
                "high-precision MVs unsupported (allow_high_precision_mv=0)"
            assert abs(m[0]) <= lim and abs(m[1]) <= lim, \
                f"MV {m} beyond decoder reference padding"
        ltx = 0   # luma tx type; chroma INHERITS it (spec compute_tx_type
                  # inter-chroma branch; the reduced inter set allows IDTX
                  # at every chroma tx size here)
        for plane, tx_size in enumerate((tx_y, tx_c, tx_c)):
            pr = r4 >> (plane > 0)
            pc = c4 >> (plane > 0)
            w4p = w4 >> (plane > 0)
            h4p = h4 >> (plane > 0)
            pbw = bw >> (plane > 0)
            pbh = bh >> (plane > 0)
            if skip:
                levels = np.zeros((pbh, pbw), np.int32)
                tc.set_txb(plane, pr, pc, w4p, h4p, 0)
            else:
                txb_ctx, dc_ctx = tc.txb_ctx(plane, pr, pc, w4p, h4p,
                                             full_block_tx=True,
                                             larger_block=False)
                levels, cul, ptx = S.read_coeffs_txb(
                    dec, fc, tx_size, int(plane > 0), txb_ctx, dc_ctx,
                    read_tx_type=True, reduced_tx_set=self.fp.reduced_tx_set,
                    allow_tx_type=self.fp.base_q_idx > 0, is_inter=True)
                tc.set_txb(plane, pr, pc, w4p, h4p, cul)
                if plane == 0:
                    ltx = ptx
                if levels.shape != (pbh, pbw):
                    # dim-64 tx: the parsed 32x32 adjusted region sits in
                    # the top-left of a zero 64x64 coefficient array
                    levels = np.pad(levels, ((0, pbh - levels.shape[0]),
                                             (0, pbw - levels.shape[1])))

            py = (pr + (self.toff[0] >> (plane > 0))) * 4
            px = (pc + (self.toff[1] >> (plane > 0))) * 4
            cpad = PAD // 2 + 1
            if warp_model is not None and pbw >= 8 and pbh >= 8:
                # warped prediction (spec predict_inter useWarp: needs
                # an 8x8 plane block; sub-8 chroma of an 8x8 luma warp
                # block falls through to translational MC below)
                from svt_av1_tpu.ops import warp as WP
                wref = self.warp_refs[self.fp.ref_frame_idx[ref - 1]]
                ssp = int(plane > 0)
                pred = WP.warp_block(wref[plane], warp_model[0],
                                     warp_model[1], px, py, pbw, pbh,
                                     ssp, ssp, self.seq.bit_depth)
            elif is_comp:
                pp0 = self.planes_pad[self.fp.ref_frame_idx[ref - 1]]
                pp1 = self.planes_pad[self.fp.ref_frame_idx[ref2 - 1]]
                ppad = PAD if plane == 0 else cpad
                bd_ = self.seq.bit_depth
                filt_ = self.fp.interp_filter
                pred = MC.jnt_average(
                    np,
                    MC.jnt_pred_np(pp0[plane], py, px, mv8, (pbh, pbw),
                                   ppad, plane > 0, bd_, filt_),
                    MC.jnt_pred_np(pp1[plane], py, px, mv8b, (pbh, pbw),
                                   ppad, plane > 0, bd_, filt_), bd_)
            elif plane == 0:
                r0 = py + PAD + (mv8[0] >> 3)
                c0 = px + PAD + (mv8[1] >> 3)
                pred = bank_y[((mv8[0] * 2) & 15) >> 2,
                              ((mv8[1] * 2) & 15) >> 2][
                    r0 : r0 + pbh, c0 : c0 + pbw]
            else:
                r0 = py + cpad + (mv8[0] >> 4)
                c0 = px + cpad + (mv8[1] >> 4)
                bank_c = bank_u if plane == 1 else bank_v
                pred = bank_c[(mv8[0] & 15) >> 1,
                              (mv8[1] & 15) >> 1][
                    r0 : r0 + pbh, c0 : c0 + pbw]
            bd2 = self.seq.bit_depth
            dq = Q.dequantize_np(levels, self._block_q(), tx_size, bd2)
            resid = T.inv_txfm2d_np(dq, tx_size, ltx, bd2)
            self.rec[plane][py : py + pbh, px : px + pbw] = np.clip(
                pred + resid, 0, (1 << bd2) - 1)

    def _block(self, r4: int, c4: int, lbs: int = 8) -> None:
        dec, fc, tc = self.dec, self.fc, self.tc
        n4 = lbs // 4

        ctx = tc.skip_ctx(r4, c4)
        cdf = fc.skip[ctx]
        skip = dec.decode_symbol(cdf, 2)
        update_icdf(cdf, skip, 2)
        self._read_cdef(r4, c4, skip)

        if self.fp.allow_intrabc:
            # intra block copy (spec use_intrabc; the encoder's
            # pipeline/ibc.py only emits staircase-causal DVs, so the
            # z-order copy below always reads finished recon)
            cdf = fc.intrabc
            use = dec.decode_symbol(cdf, 2)
            update_icdf(cdf, use, 2)
            if use:
                dv_ref = MVP.dv_ref_for_block(self.mi, r4, c4, n4, n4)
                mv8 = S.code_mv(None, dec, fc.dv, dv_ref,
                                force_integer=True)
                assert mv8[0] % 8 == 0 and mv8[1] % 8 == 0
                tc.set_block(r4, c4, n4, n4, S.block_size_of(n4, n4),
                             S.DC_PRED, skip)
                self.mi.set_block(r4, c4, n4, n4, is_inter=True,
                                  ref_frame=MVP.INTRA_FRAME, mode=0,
                                  mv=mv8)
                self.w4_map[r4 + self.toff[0] : r4 + self.toff[0] + n4,
                            c4 + self.toff[1] : c4 + self.toff[1] + n4] \
                    = n4
                self.h4_map[r4 + self.toff[0] : r4 + self.toff[0] + n4,
                            c4 + self.toff[1] : c4 + self.toff[1] + n4] \
                    = n4
                ltx = 0
                bd = self.seq.bit_depth
                for plane, tx_size in enumerate(
                        (self._TX_OF[lbs], self._TX_OF_C[lbs],
                         self._TX_OF_C[lbs])):
                    pr = r4 >> (plane > 0)
                    pc = c4 >> (plane > 0)
                    w4 = n4 >> (plane > 0)
                    bs = lbs if plane == 0 else lbs // 2
                    if skip:
                        levels = np.zeros((bs, bs), np.int32)
                        tc.set_txb(plane, pr, pc, w4, w4, 0)
                    else:
                        txb_ctx, dc_ctx = tc.txb_ctx(
                            plane, pr, pc, w4, w4, full_block_tx=True,
                            larger_block=False)
                        levels, cul, ptx = S.read_coeffs_txb(
                            dec, fc, tx_size, int(plane > 0), txb_ctx,
                            dc_ctx, read_tx_type=True,
                            reduced_tx_set=self.fp.reduced_tx_set,
                            allow_tx_type=self.fp.base_q_idx > 0,
                            is_inter=True)
                        tc.set_txb(plane, pr, pc, w4, w4, cul)
                        if plane == 0:
                            ltx = ptx
                    rec = self.rec[plane]
                    py = (pr + (self.toff[0] >> (plane > 0))) * 4
                    px = (pc + (self.toff[1] >> (plane > 0))) * 4
                    dvr = (mv8[0] >> 3) >> (plane > 0)
                    dvc = (mv8[1] >> 3) >> (plane > 0)
                    pred = rec[py + dvr : py + dvr + bs,
                               px + dvc : px + dvc + bs]
                    dq = Q.dequantize_np(levels, self._block_q(),
                                         tx_size, bd)
                    resid = T.inv_txfm2d_np(dq, tx_size, ltx, bd)
                    rec[py : py + bs, px : px + bs] = np.clip(
                        pred + resid, 0, (1 << bd) - 1)
                return

        actx, lctx = tc.kf_y_ctx(r4, c4)
        cdf = fc.kf_y_mode[actx][lctx]
        y_mode = dec.decode_symbol(cdf, 13)
        update_icdf(cdf, y_mode, 13)
        y_delta = 0
        if S.V_PRED <= y_mode <= S.D67_PRED:
            cdf = fc.angle_delta[y_mode - S.V_PRED]
            d = dec.decode_symbol(cdf, 7)
            update_icdf(cdf, d, 7)
            y_delta = d - S.MAX_ANGLE_DELTA

        cdf = fc.uv_mode[1][y_mode]
        uv_mode = dec.decode_symbol(cdf, 14)
        update_icdf(cdf, uv_mode, 14)
        uv_delta = 0
        cfl_au = cfl_av = 0
        if uv_mode == S.UV_CFL_PRED:
            cfl_au, cfl_av = S.code_cfl_alphas(None, dec, fc)
        if S.V_PRED <= uv_mode <= S.D67_PRED:
            cdf = fc.angle_delta[uv_mode - S.V_PRED]
            d = dec.decode_symbol(cdf, 7)
            update_icdf(cdf, d, 7)
            uv_delta = d - S.MAX_ANGLE_DELTA
        assert uv_mode in _UV_TX, f"unsupported uv mode {uv_mode}"

        tc.set_block(r4, c4, n4, n4, S.block_size_of(n4, n4), y_mode,
                     skip)
        self.w4_map[r4 + self.toff[0] : r4 + self.toff[0] + n4,
                    c4 + self.toff[1] : c4 + self.toff[1] + n4] = n4
        self.h4_map[r4 + self.toff[0] : r4 + self.toff[0] + n4,
                    c4 + self.toff[1] : c4 + self.toff[1] + n4] = n4

        for plane, tx_size in enumerate(
                (self._TX_OF[lbs], self._TX_OF_C[lbs],
                 self._TX_OF_C[lbs])):
            pr = r4 >> (plane > 0)
            pc = c4 >> (plane > 0)
            w4 = n4 >> (plane > 0)
            bs = lbs if plane == 0 else lbs // 2
            mode = ((y_mode, y_delta) if plane == 0
                    else (uv_mode, uv_delta))
            if skip:
                levels = np.zeros((bs, bs), np.int32)
                tc.set_txb(plane, pr, pc, w4, w4, 0)
            else:
                txb_ctx, dc_ctx = tc.txb_ctx(plane, pr, pc, w4, w4,
                                             full_block_tx=True,
                                             larger_block=False)
                levels, cul, _ = S.read_coeffs_txb(
                    dec, fc, tx_size, int(plane > 0), txb_ctx, dc_ctx,
                    read_tx_type=True, y_mode=y_mode,
                    reduced_tx_set=self.fp.reduced_tx_set,
                    allow_tx_type=self.fp.base_q_idx > 0)
                tc.set_txb(plane, pr, pc, w4, w4, cul)

            rec = self.rec[plane]
            py = (pr + (self.toff[0] >> (plane > 0))) * 4
            px = (pc + (self.toff[1] >> (plane > 0))) * 4
            ha, hl = py > 0, px > 0
            above = rec[py - 1, px : px + bs] if ha else np.zeros(bs, np.int32)
            left = rec[py : py + bs, px - 1] if hl else np.zeros(bs, np.int32)
            tl = int(rec[py - 1, px - 1]) if (ha and hl) else 0
            above_ext = None
            if plane == 0:
                if lbs == 8:
                    ar_avail, _bl = intra.edge_availability(
                        self.tc.mi_rows // 2, self.tc.mi_cols // 2)
                    ar = ar_avail[r4 // 2, c4 // 2]
                else:
                    # unit-granularity availability + full-strip rule
                    # (mirror of pipeline.intra_encoder.frame_step16)
                    nbw = self.tc.mi_cols // 2
                    ar_u, _bl = intra.edge_availability(
                        -(-self.tc.mi_rows // 4),
                        -(-self.tc.mi_cols // 4), per_sb=4)
                    ar = (ar_u[r4 // 4, c4 // 4]
                          and (2 * (c4 // 4) + 3) < nbw)
                if ar:
                    above_ext = rec[py - 1, px + bs : px + 2 * bs]
            bd = self.seq.bit_depth
            if plane > 0 and uv_mode == S.UV_CFL_PRED:
                # CFL (spec 7.11.5): DC base + alpha-scaled AC of the
                # block's reconstructed luma (decoded just above)
                pred = intra.predict_block_np(
                    (S.DC_PRED, 0), above, left, tl, ha, hl, bs, bs, bd)
                ly0 = (r4 + self.toff[0]) * 4
                lx0 = (c4 + self.toff[1]) * 4
                lrec = self.rec[0][ly0 : ly0 + lbs, lx0 : lx0 + lbs]
                lq3 = ((lrec[0::2, 0::2] + lrec[0::2, 1::2]
                        + lrec[1::2, 0::2] + lrec[1::2, 1::2]) << 1)
                shift = 2 * int(np.log2(bs))
                ac = lq3 - ((lq3.sum() + (1 << (shift - 1))) >> shift)
                alpha = cfl_au if plane == 1 else cfl_av
                sc = alpha * ac
                sc = np.where(sc >= 0, (sc + 32) >> 6, -((-sc + 32) >> 6))
                pred = np.clip(pred + sc, 0, (1 << bd) - 1)
            else:
                pred = intra.predict_block_np(mode, above, left, tl, ha,
                                              hl, bs, bs, bd,
                                              above_ext=above_ext)
            dq = Q.dequantize_np(levels, self._block_q(), tx_size, bd)
            # intra chroma tx type is derived from the uv mode (spec
            # compute_tx_type; ref intra_mode_to_tx_type,
            # EbModeDecision.c:1851); luma stays at the coded DCT
            ctx_type = T.DCT_DCT if plane == 0 else _UV_TX[uv_mode]
            resid = T.inv_txfm2d_np(dq, tx_size, ctx_type, bd)
            rec[py : py + bs, px : px + bs] = np.clip(pred + resid, 0,
                                                      (1 << bd) - 1)
