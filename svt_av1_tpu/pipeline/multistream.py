"""Multi-stream batched encoding: S independent streams per device step.

The reference scales throughput with multi-channel instances
(channel_id / active_channel_count, EbSvtAv1Enc.h:292) — S encoder
instances on one machine.  The TPU analog batches the S streams' frame
steps into ONE vmapped device program: the sequential reference chain of
each stream stays intact, but dispatch overhead and small-op latency are
amortized S-fold — the single-chip form of the live-transcode config
(BASELINE config 5: 4x1080p streams).

Streams must be in lockstep (same geometry, q, and frame kind at each
step), which holds for fixed-keyframe-interval transcode ladders.
"""

from __future__ import annotations

from typing import List

import numpy as np

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.entropy import obu as O
from svt_av1_tpu.pipeline import inter_encoder as PE
from svt_av1_tpu.pipeline import intra_encoder as IE
from svt_av1_tpu.pipeline.encoder import Encoder, Packet


class MultiStreamEncoder:
    """S lockstep IPPP streams, one vmapped device step per frame slot.

    send(frames): one source frame per stream -> list of S Packets (in
    stream order).  Keyframes batch through the intra batch step;
    P frames batch through a vmapped P step with per-stream refs.
    """

    def __init__(self, config: EncoderConfig, n_streams: int,
                 mesh=None) -> None:
        assert config.pred_structure == 0 and not config.intra_only, \
            "multi-stream batching targets flat low-delay P"
        assert not config.enable_restoration
        # lockstep constraint: per-frame open-loop host decisions that
        # would diverge across slots are pinned — no per-frame global
        # motion, and the interpolation filter is the configured one
        # (auto resolves to REGULAR) instead of the first-frame content
        # decision.  Encoder (sequential) makes the same choices when
        # given this normalized config.
        config = config.replace(
            enable_global_motion=False,
            interp_filter=max(0, config.interp_filter))
        self.n = n_streams
        self.cfg = config
        # optional device mesh: the stream axis shards over 'gop' — jit
        # propagates the input sharding through the whole step (GSPMD),
        # so every device encodes its own streams with no collectives
        self._shard = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            assert n_streams % mesh.devices.size == 0, \
                (n_streams, mesh.devices.size)
            self._shard = NamedSharding(mesh, PartitionSpec("gop"))
        # one logical Encoder per stream for entropy/packetization state
        self.encs: List[Encoder] = []
        for _ in range(n_streams):
            c = EncoderConfig(**{f.name: getattr(config, f.name)
                                 for f in config.__dataclass_fields__
                                 .values()})
            c.scene_change_detection = False
            self.encs.append(Encoder(c))
        self._refs = None      # stacked device ref planes [S, ...]
        self._idx = 0


    def _put(self, x):
        """Upload a [S, ...] stacked array, sharded over the mesh when
        one is configured."""
        import jax
        import jax.numpy as jnp
        a = jnp.asarray(x)
        if self._shard is not None:
            a = jax.device_put(a, self._shard)
        return a

    def send(self, frames: List) -> List[Packet]:
        import jax
        import jax.numpy as jnp
        assert len(frames) == self.n
        e0 = self.encs[0]
        cfg = self.cfg
        seq = e0.seq
        ph, pw = seq.mi_rows * 4, seq.mi_cols * 4
        ph32, pw32 = -(-ph // 64) * 64, -(-pw // 64) * 64
        key = self.encs[0]._is_key(self._idx)
        qindex = e0._frame_qindex(key)
        self._idx += 1
        px = np.uint8 if cfg.bit_depth == 8 else np.uint16

        if key or self._refs is None:
            nbh, nbw = ph // 8, pw // 8
            sy = self._put(np.stack([IE.block_planes(
                IE.pad_plane(f.y.astype(px), ph, pw), 8) for f in frames]))
            su = self._put(np.stack([IE.block_planes(
                IE.pad_plane(f.u.astype(px), ph // 2, pw // 2), 4)
                for f in frames]))
            sv = self._put(np.stack([IE.block_planes(
                IE.pad_plane(f.v.astype(px), ph // 2, pw // 2), 4)
                for f in frames]))
            if e0._rc is None:
                out = IE.build_batch_frame_encoder(nbh, nbw, qindex,
                                                   cfg.bit_depth)(sy, su, sv)
            else:
                # dynamic-q batch so VBR q changes never recompile
                out = IE.build_batch_frame_encoder_dyn(
                    nbh, nbw, cfg.bit_depth)(sy, su, sv, jnp.int32(qindex))
            deb = None
            if cfg.enable_deblocking or cfg.enable_cdef:
                from svt_av1_tpu.ops import cdef as CDEF
                from svt_av1_tpu.pipeline.encoder import (_intra_postproc_fn,
                                                          _unblock_dev)
                lvls = e0._lf_levels(qindex, True)
                y = jax.vmap(_unblock_dev)(out[4])
                u = jax.vmap(_unblock_dev)(out[5])
                v = jax.vmap(_unblock_dev)(out[6])
                s_y = jax.vmap(_unblock_dev)(sy)
                s_u = jax.vmap(_unblock_dev)(su)
                s_v = jax.vmap(_unblock_dev)(sv)
                sk = ((out[1] == 0).all((-1, -2))
                      & (out[2] == 0).all((-1, -2))
                      & (out[3] == 0).all((-1, -2)))
                deb = _intra_postproc_fn(ph, pw, True, cfg.enable_cdef,
                                         cfg.bit_depth)(
                    y, u, v, s_y, s_u, s_v, sk,
                    jnp.int32(lvls[0]), jnp.int32(lvls[2]),
                    jnp.int32(lvls[3]),
                    jnp.int32(CDEF.pick_damping(qindex)))
            devs = IE.materialize_batch(out, nbh, nbw, with_recon=deb is None)
            if deb is not None:
                planes = [np.asarray(a) for a in deb[:3]]
                idx = np.asarray(deb[3])
                for s, d in enumerate(devs):
                    d["recon_y"] = planes[0][s]
                    d["recon_u"] = planes[1][s]
                    d["recon_v"] = planes[2][s]
                    d["cdef_idx"] = idx[s]
            recs = [np.stack([d[k] for d in devs])
                    for k in ("recon_y", "recon_u", "recon_v")]
            pads = ((0, 0), (0, ph32 - ph), (0, pw32 - pw))
            padc = ((0, 0), (0, (ph32 - ph) // 2), (0, (pw32 - pw) // 2))
            self._refs = (
                self._put(np.pad(recs[0], pads, mode="edge")),
                self._put(np.pad(recs[1], padc, mode="edge")),
                self._put(np.pad(recs[2], padc, mode="edge")))
            pkts = []
            for s in range(self.n):
                pkt = self.encs[s]._make_packet(frames[s], devs[s], qindex,
                                                coded_idx=self._idx - 1)
                pkt.pts = self._idx - 1
                pkts.append(pkt)
            self._rc_feedback(pkts, True)
            return pkts

        step = _batched_p_step(ph32, pw32, seq.mi_rows, seq.mi_cols,
                               cfg.enable_deblocking, cfg.enable_cdef,
                               cfg.bit_depth, rdo=cfg.enc_mode <= 7,
                               txs=cfg.enc_mode <= 5,
                               rect=cfg.enc_mode <= 5,
                               filt=max(0, cfg.interp_filter))
        sy = self._put(np.stack([IE.pad_plane(f.y.astype(px), ph32, pw32)
                                 for f in frames]))
        su = self._put(np.stack([IE.pad_plane(
            f.u.astype(px), ph32 // 2, pw32 // 2) for f in frames]))
        sv = self._put(np.stack([IE.pad_plane(
            f.v.astype(px), ph32 // 2, pw32 // 2) for f in frames]))
        out = step(sy, su, sv, *self._refs, jnp.int32(qindex))
        pads = ((0, 0), (0, ph32 - ph), (0, pw32 - pw))
        padc = ((0, 0), (0, (ph32 - ph) // 2), (0, (pw32 - pw) // 2))
        self._refs = (
            jnp.pad(out[5][:, :ph, :pw], pads, mode="edge"),
            jnp.pad(out[6][:, : ph // 2, : pw // 2], padc, mode="edge"),
            jnp.pad(out[7][:, : ph // 2, : pw // 2], padc, mode="edge"))
        pkts = []
        for s in range(self.n):
            per = tuple(a[s] for a in out)
            pkt = self.encs[s]._make_inter_packet(frames[s], per, qindex,
                                                  coded_idx=self._idx - 1)
            pkt.pts = self._idx - 1
            pkts.append(pkt)
        self._rc_feedback(pkts, False)
        return pkts

    def _rc_feedback(self, pkts: List[Packet], is_key: bool) -> None:
        """Streams run in lockstep with a SHARED q, so the controller that
        picks q (encs[0]'s) absorbs the mean per-stream bits — without
        this, VBR/CVBR froze at the initial qindex (packets bypass
        Encoder._finish_one where _rc.update normally runs)."""
        rc = self.encs[0]._rc
        if rc is not None:
            mean_bits = sum(len(p.payload) for p in pkts) * 8 / len(pkts)
            rc.update(int(mean_bits), is_key)


import functools


@functools.lru_cache(maxsize=4)
def _batched_p_step(ph32: int, pw32: int, mi_rows: int, mi_cols: int,
                    deblock: bool, cdef: bool, bd: int, rdo: bool = True,
                    txs: bool = False, rect: bool = False,
                    filt: int = 0):
    """vmapped dynamic-q P step over the stream axis (shared q)."""
    import jax
    import jax.numpy as jnp
    from svt_av1_tpu.ops import deblock as DB

    fn = PE.p_frame_step(ph32, pw32, None, bd=bd, rdo=rdo, txs=txs,
                         rect=rect, filt=filt)
    fn.bind_masks(mi_rows, mi_cols, False, cdef)

    def one(sy, su, sv, ry, ru, rv, q):
        if deblock:
            ly, lu, lv = DB.pick_filter_levels_traced(jnp, q)
        else:
            ly = lu = lv = jnp.int32(0)
        return fn(sy, su, sv, ry, ru, rv, q, ly, lu, lv)

    return jax.jit(jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, None)))
