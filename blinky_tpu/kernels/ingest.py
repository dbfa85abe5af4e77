"""Device-side equirect→cubemap ingestion: a static gather, like the remap.

The pano→plate resampling geometry depends only on (pano size, platesize,
globe) — never on the frame — so it compiles to a STATIC index/weight
table exactly like the lensmap (the same insight that makes the remap a
batched row gather, ``kernels/remap.py``).  Ingesting a video batch is
then one device call: K row-gathers (K=1 nearest, K=4 bilinear) over
batch-innermost panos plus elementwise channel lerps — no per-frame host
trigonometry.

Geometry matches :func:`blinky_tpu.io.cubemap.equirect_to_cubemap` (which
delegates its per-frame host path to these tables): plate texel →
``plate_uv_to_ray`` (``fisheye.c:1198-1214``) → ``ray_to_latlon``
(``fisheye.c:1192``) → equirect row/col with longitude wrap and pole
clamp.  Weights are float32 in both the host and device executors so the
two paths agree bit-for-bit.

Measured on the attached v5e (4096×2048 pano → 720p end-to-end chain,
B=128, device-resident): **1439 panos/s bilinear, 2813 nearest**.
Batch size matters enormously here: B is the MINOR axis of the gathered
rows and the hardware moves 128-lane tiles, so B=16 wastes 7/8ths of
every tile row and runs ~15× slower (docs/PERF.md §9) — keep B a
multiple of 128.  Through the axon relay the host→device
upload of the pano batch (512 MB) dominates, so the *import-to-disk* CLI
path stays on the host executor; the device kernel is for pipelines that
stay on-device — :meth:`blinky_tpu.api.Session.render_equirect` chains
it straight into the remap so only warped screens leave the chip.
"""

from __future__ import annotations

import numpy as np

from blinky_tpu import geometry
from blinky_tpu.palette import MAX_PLATES


def _build_tables(pano_h, pano_w, platesize, globe, bilinear):
    """Static (indices [K, P*S*S] i32 into the flattened pano,
    weights [K, P*S*S] f32) for every plate texel; unused plates point
    at index 0 with weight 0."""
    S = int(platesize)
    H, W = int(pano_h), int(pano_w)
    grid = (np.arange(S, dtype=np.float64) + 0.5) / S
    u, v = np.meshgrid(grid, grid)  # [S, S], v = rows

    K = 4 if bilinear else 1
    idx = np.zeros((K, MAX_PLATES, S, S), np.int64)
    w = np.zeros((K, MAX_PLATES, S, S), np.float32)
    for p in range(globe.numplates):
        x, y, z = geometry.plate_uv_to_ray(
            u, v,
            np.asarray(globe.forward[p], np.float64),
            np.asarray(globe.right[p], np.float64),
            np.asarray(globe.up[p], np.float64),
            float(globe.dist[p]),
        )
        lat, lon = geometry.ray_to_latlon(x, y, z)
        col = (lon + np.pi) / (2 * np.pi) * W  # wraps
        row = (np.pi / 2 - lat) / np.pi * H    # clamps at the poles
        if bilinear:
            c0 = np.floor(col - 0.5).astype(np.int64)
            r0 = np.floor(row - 0.5).astype(np.int64)
            fc = (col - 0.5 - c0).astype(np.float32)
            fr = (row - 0.5 - r0).astype(np.float32)
            for k, (dc, dr) in enumerate(((0, 0), (1, 0), (0, 1), (1, 1))):
                ri = np.clip(r0 + dr, 0, H - 1)
                ci = np.mod(c0 + dc, W)
                idx[k, p] = ri * W + ci
                w[k, p] = ((fc if dc else 1 - fc) *
                           (fr if dr else 1 - fr)).astype(np.float32)
        else:
            ri = np.clip(np.floor(row).astype(np.int64), 0, H - 1)
            ci = np.mod(np.floor(col).astype(np.int64), W)
            idx[0, p] = ri * W + ci
            w[0, p] = 1.0
    return idx.reshape(K, -1).astype(np.int32), w.reshape(K, -1)


class EquirectIngest:
    """Reusable pano→plates resampler for one (pano size, platesize,
    globe, sampling) configuration.

    * ``__call__(panos)`` — device path: ``[H, W, B]`` packed-RGBA u32
      (batch-innermost, like every source in this framework) →
      ``[MAX_PLATES, S, S, B]`` u32, one jitted call.
    * ``host(pano)`` — NumPy path for a single ``[H, W]`` u32 pano,
      identical tables and float32 weights (bit-equal to the device
      path's math).
    """

    def __init__(self, pano_h: int, pano_w: int, platesize: int,
                 globe=None, bilinear: bool = True):
        from blinky_tpu import globes as globes_mod

        self.globe = globes_mod.get("cube") if globe is None else globe
        self.platesize = int(platesize)
        self.pano_hw = (int(pano_h), int(pano_w))
        self.bilinear = bool(bilinear)
        self.idx, self.w = _build_tables(pano_h, pano_w, platesize,
                                         self.globe, bilinear)
        # plates beyond the globe's count are zeroed in the output (their
        # table rows point at index 0, which would otherwise replicate
        # the pano's top-left texel through the nearest path)
        mask = np.zeros(MAX_PLATES, np.uint32)
        mask[: self.globe.numplates] = 0xFFFFFFFF
        self.plate_mask = np.repeat(mask, self.platesize * self.platesize)
        self._jitted = None

    # shared math: K gathered u32 rows -> blended u32 (float32 weights)
    @staticmethod
    def _blend(rows, w, xp):
        if len(rows) == 1:
            return rows[0]
        out = xp.zeros_like(rows[0]) | (xp.uint32(0xFF) << 24)
        for shift in (0, 8, 16):
            acc = None
            for k, r in enumerate(rows):
                c = ((r >> shift) & 0xFF).astype(xp.float32)
                wk = w[k].reshape(w[k].shape + (1,) * (r.ndim - 1))
                acc = c * wk if acc is None else acc + c * wk
            ch = xp.clip(acc + 0.5, 0, 255).astype(xp.uint32)
            out = out | (ch << shift)
        return out

    # _texel_shape is how the flat texel axis reshapes in outputs:
    # (MAX_PLATES, S, S) here, (R,) for a texel subset — everything else
    # (tables, validation, gather, blend, mask) is shared
    @property
    def _texel_shape(self):
        return (MAX_PLATES, self.platesize, self.platesize)

    def __call__(self, panos):
        """[H, W, B] u32 (batch-innermost) -> [MAX_PLATES, S, S, B] u32
        (``[R, B]`` for a :meth:`subset` view).

        Single panos go through :meth:`host`, or pass ``[..., None]``."""
        import jax
        import jax.numpy as jnp

        if self._jitted is None:
            idx = jnp.asarray(self.idx)
            w = jnp.asarray(self.w)
            pmask = jnp.asarray(self.plate_mask)
            tshape = self._texel_shape

            @jax.jit
            def run(panos):
                flat = panos.reshape((-1,) + panos.shape[2:])
                rows = [jnp.take(flat, idx[k], axis=0)
                        for k in range(idx.shape[0])]
                out = EquirectIngest._blend(rows, w, jnp)
                out = out & pmask.reshape(pmask.shape + (1,) * (out.ndim - 1))
                return out.reshape(tshape + panos.shape[2:])

            self._jitted = run
        import jax.numpy as jnp

        panos = jnp.asarray(panos, jnp.uint32)
        if panos.ndim != 3 or panos.shape[:2] != self.pano_hw:
            raise ValueError(f"panos must be [H, W, B] = "
                             f"{self.pano_hw + ('B',)}, got {panos.shape}")
        return self._jitted(panos)

    def host(self, pano) -> np.ndarray:
        """NumPy executor over one [H, W] u32 pano -> [P, S, S] u32
        (``[R]`` for a :meth:`subset` view)."""
        pano = np.asarray(pano, np.uint32)
        if pano.shape != self.pano_hw:
            raise ValueError(f"pano shape {pano.shape} != {self.pano_hw}")
        flat = pano.reshape(-1)
        rows = [flat[self.idx[k]] for k in range(self.idx.shape[0])]
        out = self._blend(rows, self.w, np) & self.plate_mask
        return out.reshape(self._texel_shape)

    def subset(self, texels):
        """A view of this ingest that resamples ONLY the given flat plate
        texels — compose with ``kernels.remap.compact_texels`` so a
        chained pano→remap pipeline never computes a texel the remap
        won't read (panini@180 at 720p reads ~1/3 of the 6·S² face
        texels).

        ``texels``: [R] int flat ids into the ``[MAX_PLATES*S*S]`` texel
        space (``compact_texels``' first return).  The subset's
        ``__call__`` maps ``[H, W, B]`` panos → ``[R, B]`` u32 (feed
        :func:`blinky_tpu.kernels.remap.remap_gather_impl` with the
        compacted indices), ``host`` maps one pano → ``[R]``.  Geometry
        stays in :func:`_build_tables` — this only slices the static
        tables, so subset outputs are bit-equal to the matching texels
        of the full ingest."""
        return _EquirectIngestSubset(self, np.asarray(texels, np.int64))

    def host_nearest_u8(self, pano) -> np.ndarray:
        """Nearest-neighbor executor for u8 palette panos (indices don't
        blend); requires ``bilinear=False`` tables."""
        if self.bilinear:
            raise ValueError("palette panos need bilinear=False tables")
        pano = np.asarray(pano, np.uint8)
        if pano.shape != self.pano_hw:
            raise ValueError(f"pano shape {pano.shape} != {self.pano_hw}")
        out = pano.reshape(-1)[self.idx[0]] & self.plate_mask.astype(np.uint8)
        return out.reshape(MAX_PLATES, self.platesize, self.platesize)

class EquirectScreenKernel:
    """Fused pano->screen: the ingest's K-tap tables composed THROUGH the
    lensmap so the whole 360-video chain is ONE gather stage (VERDICT r3
    task 2 — the reference's own one-hop ``render_lensmap`` design,
    ``fisheye.c:2406-2424``, where the per-pixel pointer reaches the
    final storage directly).

    Composition is pure host-side table indexing: screen pixel ``p``
    reads lensmap texel ``t = flat_idx[p]``, and the ingest resamples
    ``t`` from pano taps ``(idx[k, t], w[k, t])`` — so the composed
    tables are ``idx[:, flat_idx]`` / ``w[:, flat_idx]`` with shape
    ``[K, H*W]``.  Per batch this gathers K x H*W pano rows and blends,
    with NO materialized faces intermediate: vs the texel-compacted
    two-stage chain it drops the remap's extra gather stage and the
    [R, B] u32 faces round-trip through HBM.  Since the per-pixel blend
    runs the identical float32 arithmetic on the identical taps the
    face texel would have received, outputs are bit-equal to the
    two-stage chain (nearest: a pure index composition), including the
    post-gather rubix tint (:func:`blinky_tpu.kernels.remap.
    apply_tint_rgba` applied to the blended value, as
    ``remap_gather_tint_impl`` applies it to the gathered face texel).

    Keep the two-stage path (`EquirectIngest` + `RemapKernel`) when one
    ingest feeds SEVERAL lenses — faces are computed once there, while
    this kernel re-resamples per lens.

    ``remap``: a :class:`blinky_tpu.kernels.remap.RemapKernel` — its
    lensmap picks the composition, its validity/background/tint state
    is reused so a fused render matches ``RemapKernel`` semantics
    exactly.
    """

    def __init__(self, ingest: EquirectIngest, remap):
        import jax.numpy as jnp

        if isinstance(ingest, _EquirectIngestSubset):
            raise TypeError(
                "compose from the FULL-layout EquirectIngest — the fused "
                "kernel is already the ultimate texel compaction")
        lm = remap.lensmap
        if ingest.platesize != lm.platesize:
            raise ValueError(
                f"ingest platesize {ingest.platesize} != lensmap "
                f"platesize {lm.platesize}")
        t = np.asarray(lm.flat_idx).reshape(-1)
        self.idx = jnp.asarray(ingest.idx[:, t])  # [K, H*W]
        self.w = jnp.asarray(ingest.w[:, t])
        self.remap = remap
        self.pano_hw = ingest.pano_hw
        self.bilinear = ingest.bilinear
        self.shape = (lm.height_px, lm.width_px)
        self._jitted = {}

    def __call__(self, panos, rubix=False):
        """[H, W, B] u32 panos -> [H_out, W_out, B] u32 screens."""
        import jax
        import jax.numpy as jnp

        from blinky_tpu.kernels.remap import apply_tint_rgba

        panos = jnp.asarray(panos, jnp.uint32)
        if panos.ndim != 3 or panos.shape[:2] != self.pano_hw:
            raise ValueError(f"panos must be [H, W, B] = "
                             f"{self.pano_hw + ('B',)}, got {panos.shape}")
        rubix = bool(rubix)
        if rubix not in self._jitted:
            idx, w = self.idx, self.w
            H, W = self.shape
            valid = self.remap.valid
            bg = self.remap.background_rgba
            tr, tm = self.remap.tint_rgb_mask if rubix else (None, None)

            @jax.jit
            def run(panos):
                B = panos.shape[-1]
                flat = panos.reshape(-1, B)
                rows = [jnp.take(flat, idx[k], axis=0)
                        for k in range(idx.shape[0])]
                g = EquirectIngest._blend(rows, w, jnp)  # [H*W, B]
                if rubix:
                    g = apply_tint_rgba(g, tr.reshape(H * W, 1),
                                        tm.reshape(H * W, 1))
                out = jnp.where(valid.reshape(H * W, 1), g,
                                bg.reshape(H * W, 1))
                return out.reshape(H, W, B)

            self._jitted[rubix] = run
        return self._jitted[rubix](panos)


class CompactEquirectChain:
    """Texel-compacted two-stage pano->screen: the WINNING formulation
    on v5e (docs/PERF.md §9, round 4).

    Stage 1 resamples ONLY the texels the lensmap references, in SORTED
    texel order (:meth:`EquirectIngest.subset` of ``compact_texels``'
    unique set); stage 2 is the compacted remap gather.  Measured at
    4096x2048->720p B=128 bilinear: **2880 panos/s** vs 2102 for the
    one-hop composed kernel (:class:`EquirectScreenKernel`) vs 1390 for
    the full-faces two-stage — the composed kernel issues its pano row
    gathers in shuffled SCREEN order while this chain's are sorted
    unique texels, and on this chip sorted row-gathers from the
    multi-GB pano operand beat the saved intermediate (the [R, B]
    faces round-trip is small).  Same ``__call__(panos, rubix=)``
    contract as the fused kernel; bit-equal to both other forms.
    """

    def __init__(self, ingest: EquirectIngest, remap):
        import jax.numpy as jnp

        from blinky_tpu.kernels.remap import compact_texels

        if isinstance(ingest, _EquirectIngestSubset):
            raise TypeError("pass the FULL-layout EquirectIngest — the "
                            "chain derives its own texel subset")
        lm = remap.lensmap
        if ingest.platesize != lm.platesize:
            raise ValueError(
                f"ingest platesize {ingest.platesize} != lensmap "
                f"platesize {lm.platesize}")
        texels, cidx = compact_texels(lm.to_numpy())
        self.sub = ingest.subset(texels)
        self.cidx = jnp.asarray(cidx)
        self.remap = remap
        self.pano_hw = ingest.pano_hw
        self.bilinear = ingest.bilinear

    def __call__(self, panos, rubix=False):
        """[H, W, B] u32 panos -> [H_out, W_out, B] u32 screens."""
        import jax.numpy as jnp

        from blinky_tpu.kernels.remap import (
            _remap_gather, _remap_gather_tint,
        )

        panos = jnp.asarray(panos, jnp.uint32)
        if panos.ndim != 3 or panos.shape[:2] != self.pano_hw:
            raise ValueError(f"panos must be [H, W, B] = "
                             f"{self.pano_hw + ('B',)}, got {panos.shape}")
        sub = self.sub(panos)  # [R, B] u32, sorted texel order
        # stage 2 through the JITTED wrappers (the same executables
        # RemapKernel warms): the bare impls ran eagerly — one relay
        # dispatch per op instead of one fused call
        if rubix:
            tr, tm = self.remap.tint_rgb_mask
            return _remap_gather_tint(
                sub, self.cidx, self.remap.valid,
                self.remap.background_rgba, tr, tm)
        return _remap_gather(sub, self.cidx, self.remap.valid,
                             self.remap.background_rgba)


def equirect_screen_sharded(kernel: EquirectScreenKernel, panos, mesh,
                            rubix=False):
    """The fused pano->screen kernel with the pano BATCH sharded over the
    mesh's "data" axis (batch-innermost, like every source here); the
    composed tables and screen-shaped state replicate (K·H·W·8 bytes —
    ~30 MB at 720p bilinear)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from blinky_tpu.parallel import data_axes

    panos = jax.device_put(jnp.asarray(panos, jnp.uint32),
                           NamedSharding(mesh, P(None, None, data_axes(mesh))))
    return kernel(panos, rubix=rubix)


class _EquirectIngestSubset(EquirectIngest):
    """Texel-subset view of an :class:`EquirectIngest` (see
    :meth:`EquirectIngest.subset`): the parent's static tables sliced to
    the kept texels; ``__call__``/``host`` are inherited (only the
    output ``_texel_shape`` differs — flat ``[R]``)."""

    def __init__(self, parent: EquirectIngest, texels):
        # deliberately no super().__init__: tables come sliced from the
        # parent (and the parent object is NOT retained — a subset must
        # not pin the full-size tables alive)
        self.globe = parent.globe
        self.platesize = parent.platesize
        self.bilinear = parent.bilinear
        self.texels = texels
        self.pano_hw = parent.pano_hw
        self.idx = parent.idx[:, texels]
        self.w = parent.w[:, texels]
        self.plate_mask = parent.plate_mask[texels]
        self._jitted = None

    @property
    def _texel_shape(self):
        return (self.texels.size,)

    def subset(self, texels):
        raise TypeError("already a texel subset — slice the original "
                        "EquirectIngest instead")

    def host_nearest_u8(self, pano) -> np.ndarray:
        raise TypeError("host_nearest_u8 needs the full-plate layout — "
                        "use the original EquirectIngest")
