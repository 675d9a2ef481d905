"""Hierarchical maxout conv encoder/decoder (the P-VAE amortized guide).

Re-design of the reference Keras nets (ctvae/models.py:23-215) as flax.linen
modules.  Semantics preserved:

  * conv block = dropout -> two parallel convs -> elementwise max (maxout,
    models.py:334) — no norm layer (apply_norm is hard-disabled in the
    reference, main_ct_vae.py:286)
  * forward convs: wrap-around ("periodic") padding sized so spatial dims
    shrink exactly by the stride factor (models.py:305-330)
  * encoder returns ALL intermediate block outputs; the skips ARE the
    hierarchical latent parameters (models.py:98-108), channel-doubled for the
    (loc, scale) split when probabilistic
  * decoder: one input per latent level at ``channels/feature_maps_multiplier``,
    transpose-conv upsampling, center-crop to the skip shape, concat skips
    except the topmost input level, final conv -> (mean, var) split
    (models.py:146-209)

XLA notes: convolutions lower to MXU via lax.conv_general_dilated; all shapes
are static; maxout fuses into the conv epilogue.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# Compute dtype note: convs run in ``dtype`` (bfloat16 on TPU targets the MXU
# at full rate); parameters stay float32 (flax param_dtype default).  The loss
# casts activations back to float32 before any distribution math.

Array = jnp.ndarray

_GLOROT = nn.initializers.glorot_uniform()


def _periodic_pad(x: Array, pad_x: Tuple[int, int], pad_y: Tuple[int, int]) -> Array:
    """Wrap-around padding of NHWC spatial dims (reference models.py:219-263)."""
    return jnp.pad(x, ((0, 0), pad_x, pad_y, (0, 0)), mode="wrap")


def _shrink_pad(size: int, stride: int, kernel: int) -> Tuple[int, int]:
    """Padding so a VALID conv maps ``size -> ceil(size/stride)`` exactly
    (reference models.py:305-324: larger half in front)."""
    rem = size % stride
    pad = kernel - rem if rem else kernel - stride
    return (pad // 2 + pad % 2, pad // 2)


def _subpixel_strided(xp: Array, kern: Array, s: int, prec) -> Array:
    """Stride-``s`` VALID conv as space-to-depth + a stride-1 conv.

    Exact rewrite (requires ``s | kernel``): with m = k/s,

        y[h,w,f] = sum_{dh,dw,c} xp[s*h+dh, s*w+dw, c] * kern[dh,dw,c,f]
                 = sum_{i,j,(a,b,c)} z[h+i, w+j, (a,b,c)] * K2[i,j,(a,b,c),f]

    where z folds each s x s spatial cell into channels and K2 regroups the
    kernel taps (dh = s*i + a).  The rewritten conv has s^2 x the channels
    (MXU lane fill) and stride 1, so its input gradient is a plain conv —
    no lhs-dilated convolution in the backward pass.
    """
    b, hp, wp, c = xp.shape
    k = kern.shape[0]
    m = k // s
    z = xp.reshape(b, hp // s, s, wp // s, s, c)
    z = z.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp // s, wp // s, s * s * c)
    k2 = kern.reshape(m, s, m, s, c, -1)
    k2 = k2.transpose(0, 2, 1, 3, 4, 5).reshape(m, m, s * s * c, -1)
    return jax.lax.conv_general_dilated(
        z, k2, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec,
    )


def _transpose_phase_taps(k: int, s: int):
    """Tap table of lax.conv_transpose(..., 'SAME') phase decomposition.

    lax.conv_transpose pads the s-dilated input (x[j] at position s*j) by
    (pad_a, pad_b) per jax's _conv_transpose_padding, then runs a stride-1
    VALID correlation: y[t] = sum_u xpad[t+u] k[u], where xpad[i] is x[j]
    iff i = pad_a + s*j.  Output row t = s*h' + p therefore reads x[h'+d]
    against kernel row q = pad_a - p + s*d for every integer d with q in
    [0, k).  Returns (taps, d_lo, d_hi) with taps = [(p, d, q)].
    """
    pad_len = k + s - 2
    pad_a = k - 1 if s > k - 1 else -(-pad_len // 2)
    taps = []
    for p in range(s):
        for d in range(-k, k + 1):
            q = pad_a - p + s * d
            if 0 <= q < k:
                taps.append((p, d, q))
    d_lo = min(d for _, d, _ in taps)
    d_hi = max(d for _, d, _ in taps)
    return taps, d_lo, d_hi


def _subpixel_conv_transpose(x: Array, kern: Array, s: int, prec) -> Array:
    """Stride-``s`` SAME conv_transpose as one stride-1 conv + depth-to-space.

    Each of the s^2 output phases is a stride-1 correlation of x with a
    sub-kernel of ``kern`` (zero-filled where a phase has no tap); computing
    all phases as one conv with s^2 x the output channels and interleaving
    (pixel shuffle) is exact, fills MXU lanes, and keeps the backward pass
    free of lhs-dilated convolutions.  Matches
    ``lax.conv_transpose(x, kern, (s, s), 'SAME')`` bit-for-math
    (tests/test_conv_impl.py).
    """
    b, h, w, c = x.shape
    k, _, _, f2 = kern.shape
    taps, d_lo, d_hi = _transpose_phase_taps(k, s)
    wd = d_hi - d_lo + 1
    k2 = jnp.zeros((wd, wd, c, s * s * f2), kern.dtype)
    for (p, dh, qh) in taps:
        for (q, dw, qw) in taps:
            k2 = k2.at[
                dh - d_lo, dw - d_lo, :,
                (p * s + q) * f2 : (p * s + q + 1) * f2,
            ].set(kern[qh, qw])
    start = max(d_lo, 0)
    lpad = max(0, -d_lo)
    xx = x[:, start:, start:, :]
    xx = jnp.pad(xx, ((0, 0), (lpad, d_hi), (lpad, d_hi), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xx, k2, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec,
    )
    y = y.reshape(b, h, w, s, s, f2)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * s, w * s, f2)
    return y


class InstanceNorm(nn.Module):
    """Per-example, per-channel normalization with learned scale/offset.

    The reference defines a custom InstanceNormalization layer
    (models.py:346-372), selectable via ``norm_type`` but dormant because
    ``apply_norm`` is hard-coded False (main_ct_vae.py:286).  Here the same
    capability is live behind ``Config.norm_type`` (default off, matching the
    reference's effective behavior).  Stateless — no running statistics — so
    it composes with the pure train step.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        offset = self.param("offset", nn.initializers.zeros, (x.shape[-1],))
        inv = jax.lax.rsqrt(var + self.epsilon)
        return (x - mean) * inv * scale + offset


def _im2col_conv(xp: Array, kern: Array, s: int, prec) -> Array:
    """Stride-``s`` VALID conv as patch-concat + ONE matmul (im2col).

    The direct lowering reduces over C_in per spatial tap (C_in=10-48 here,
    <40% MXU lane fill — BENCH.md trace: ~2.7 TFLOP/s).  Concatenating the
    k*k taps into a (B*H'*W', k*k*C) @ (k*k*C, C_out) matmul raises the
    contraction dim to 90-432, trading 9x activation reads for lane fill
    (decided by scripts/probe_conv_fused.py's measured go/no-go).
    """
    kh, kw, cin, cout = kern.shape
    b, hp, wp, _ = xp.shape
    ho = (hp - kh) // s + 1
    wo = (wp - kw) // s + 1
    cols = jnp.concatenate(
        [
            jax.lax.slice(
                xp,
                (0, dy, dx, 0),
                (b, dy + s * (ho - 1) + 1, dx + s * (wo - 1) + 1, cin),
                (1, s, s, 1),
            )
            for dy in range(kh)
            for dx in range(kw)
        ],
        axis=-1,
    )  # (B, H', W', kh*kw*C) in the kernel's (dy, dx, c) reshape order
    y = jnp.dot(
        cols.reshape(b * ho * wo, kh * kw * cin),
        kern.reshape(kh * kw * cin, cout),
        precision=prec,
    )
    return y.reshape(b, ho, wo, cout)


class ConvBlock(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    transpose: bool = False
    dropout: float = 0.0
    norm: Optional[str] = None  # None | "instance" (ref models.py:336-340)
    dtype: jnp.dtype = jnp.float32
    # MXU pass count for the conv contraction.  None == Precision.DEFAULT ==
    # one bf16 pass with f32 accumulate (measured equal); "high"/"highest"
    # buy bf16x3/x6 f32-accurate products — see Config.conv_precision.
    precision: Optional[str] = None
    # Device data layout for the conv chain.  "NHWC" (default) puts the
    # 10-20 channel maps on the TPU's 128-wide lane (minor) dimension —
    # <16% lane fill for every elementwise op, pad, and layout copy in this
    # model (measured 49% of step device time, BENCH.md).  "NCHW" puts the
    # 128-pixel W axis in lanes instead; module interfaces stay NHWC (the
    # transposes sit at block boundaries where XLA cancels adjacent pairs).
    layout: str = "NHWC"
    # "subpixel" rewrites stride>1 convs (space-to-depth / pixel-shuffle
    # phase form — see _subpixel_strided/_subpixel_conv_transpose); NHWC
    # only, stride-1 blocks and NCHW fall back to the direct path.
    impl: str = "direct"

    @nn.compact
    def __call__(self, x: Array, *, training: bool = False) -> Array:
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=not training)
        k = (self.kernel, self.kernel)
        s = (self.stride, self.stride)
        # The maxout pair executes as ONE conv with 2F output channels whose
        # kernel is the two branch kernels concatenated (identical math: each
        # output channel's reduction is independent).  At this model's small
        # channel counts the step is bound by conv dispatch count and MXU
        # lane utilization, not FLOPs — fusing the pair halves the former and
        # doubles the latter (measured: paper-config loop 28.2 -> 32.4
        # steps/s; 37+ with the fused projector, scripts/profile_scan.py).
        # Parameters stay TWO separate Conv/ConvTranspose children so every
        # existing checkpoint (incl. the archived paper run) restores
        # unchanged; the branches are only ever CALLED at init time.
        conv_cls = nn.ConvTranspose if self.transpose else nn.Conv
        # names match flax's historical autonames so old checkpoints restore
        base = "ConvTranspose" if self.transpose else "Conv"
        conv_kw = dict(strides=s, kernel_init=_GLOROT, dtype=self.dtype)
        conv_kw["padding"] = "SAME" if self.transpose else "VALID"
        c1 = conv_cls(self.features, k, name=f"{base}_0", **conv_kw)
        c2 = conv_cls(self.features, k, name=f"{base}_1", **conv_kw)
        if self.transpose:
            xp = x
        else:
            px = _shrink_pad(x.shape[1], self.stride, self.kernel)
            py = _shrink_pad(x.shape[2], self.stride, self.kernel)
            xp = None if self.layout == "NCHW" else _periodic_pad(x, px, py)
        if self.is_initializing():
            if xp is None:
                xp = _periodic_pad(x, px, py)
            x1 = c1(xp)
            x2 = c2(xp)
            out = jnp.maximum(x1, x2)
        else:
            p1 = self.get_variable("params", f"{base}_0")
            p2 = self.get_variable("params", f"{base}_1")
            kern = jnp.concatenate(
                [p1["kernel"], p2["kernel"]], axis=-1
            ).astype(self.dtype)
            bias = jnp.concatenate([p1["bias"], p2["bias"]]).astype(self.dtype)
            prec = None if self.precision is None else jax.lax.Precision[self.precision.upper()]
            if self.layout == "NCHW":
                # channel-major: W rides the 128-lane minor dim for the pad,
                # bias, and maxout ops; NHWC only at the block boundary
                xt = jnp.transpose(x.astype(self.dtype), (0, 3, 1, 2))
                if self.transpose:
                    y = jax.lax.conv_transpose(
                        xt, kern, s, padding="SAME",
                        dimension_numbers=("NCHW", "HWIO", "NCHW"),
                        precision=prec,
                    )
                else:
                    xt = jnp.pad(xt, ((0, 0), (0, 0), px, py), mode="wrap")
                    y = jax.lax.conv_general_dilated(
                        xt, kern, s, padding="VALID",
                        dimension_numbers=("NCHW", "HWIO", "NCHW"),
                        precision=prec,
                    )
                y = y + bias[None, :, None, None]
                x1, x2 = jnp.split(y, 2, axis=1)
                out = jnp.transpose(jnp.maximum(x1, x2), (0, 2, 3, 1))
            else:
                xp = xp.astype(self.dtype) if xp is not None else None
                subpixel = (
                    self.impl == "subpixel"
                    and self.stride > 1
                    and (self.transpose or self.kernel % self.stride == 0)
                )
                if self.transpose:
                    if subpixel:
                        y = _subpixel_conv_transpose(
                            x.astype(self.dtype), kern, self.stride, prec
                        )
                    else:
                        y = jax.lax.conv_transpose(
                            x.astype(self.dtype), kern, s, padding="SAME",
                            dimension_numbers=("NHWC", "HWIO", "NHWC"),
                            precision=prec,
                        )
                elif subpixel:
                    y = _subpixel_strided(xp, kern, self.stride, prec)
                elif self.impl == "im2col":
                    y = _im2col_conv(xp, kern, self.stride, prec)
                else:
                    y = jax.lax.conv_general_dilated(
                        xp, kern, s, padding="VALID",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        precision=prec,
                    )
                y = y + bias
                x1, x2 = jnp.split(y, 2, axis=-1)
                out = jnp.maximum(x1, x2)
        if self.norm == "instance":
            out = InstanceNorm()(out.astype(jnp.float32)).astype(out.dtype)
        elif self.norm is not None:
            raise ValueError(f"unknown norm {self.norm!r} (use None or 'instance')")
        return out


class Encoder(nn.Module):
    """Downsampling stack; returns every level's activation as a latent skip."""

    num_blocks: int
    feature_maps: Sequence[int]  # per-block channels, already x feature_maps_multiplier
    kernel: int
    stride: int
    intermediate_layers: int
    intermediate_kernel: int
    dropout: float = 0.0
    feature_maps_multiplier: int = 2
    norm: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    precision: Optional[str] = None
    layout: str = "NHWC"
    impl: str = "direct"

    @nn.compact
    def __call__(self, x: Array, *, training: bool = False) -> List[Array]:
        # channel-repeat so the input level is splittable into (loc, scale)
        # (reference models.py:55)
        x = jnp.repeat(x, self.feature_maps_multiplier, axis=-1)
        skips = [x]
        for i in range(self.num_blocks):
            for _ in range(self.intermediate_layers):
                x = ConvBlock(
                    x.shape[-1], self.intermediate_kernel, 1,
                    dropout=self.dropout, norm=self.norm, dtype=self.dtype,
                    precision=self.precision, layout=self.layout, impl=self.impl,
                )(x, training=training)
            x = ConvBlock(
                self.feature_maps[i], self.kernel, self.stride,
                dropout=self.dropout, norm=self.norm, dtype=self.dtype,
                precision=self.precision, layout=self.layout, impl=self.impl,
            )(x, training=training)
            skips.append(x)
        # float32 at the interface: skips parameterize distributions
        return [s.astype(jnp.float32) for s in skips]


class Decoder(nn.Module):
    """Upsampling stack from hierarchical latent samples to (mean, var) maps."""

    skip_shapes: Sequence[Tuple[int, int, int]]  # encoder (x, y, z) per level
    final_channels: int
    kernel: int
    stride: int
    intermediate_layers: int
    intermediate_kernel: int
    dropout: float = 0.0
    norm: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    precision: Optional[str] = None
    layout: str = "NHWC"
    impl: str = "direct"

    @nn.compact
    def __call__(self, latents: Sequence[Array], *, training: bool = False) -> Tuple[Array, Array]:
        num_levels = len(latents)
        x = latents[-1]
        for i in range(num_levels - 2, -1, -1):
            target_x, target_y, target_z = self.skip_shapes[i]
            x = ConvBlock(
                target_z, self.kernel, self.stride, transpose=True,
                dropout=self.dropout, norm=self.norm, dtype=self.dtype,
                precision=self.precision, layout=self.layout, impl=self.impl,
            )(x, training=training)
            for _ in range(self.intermediate_layers):
                x = ConvBlock(
                    x.shape[-1], self.intermediate_kernel, 1,
                    dropout=self.dropout, norm=self.norm, dtype=self.dtype,
                    precision=self.precision, layout=self.layout, impl=self.impl,
                )(x, training=training)
            # center-crop to the skip's spatial dims (reference models.py:181-191)
            rx = x.shape[1] - target_x
            ry = x.shape[2] - target_y
            ox = rx // 2 + rx % 2
            oy = ry // 2 + ry % 2
            x = x[:, ox : ox + target_x, oy : oy + target_y, :]
            if i > 0:  # do not concatenate the input-level skip (models.py:192-193)
                x = jnp.concatenate([x, latents[i]], axis=-1)
        # Output head always computes in float32: with bf16 here, the ~0.4%
        # relative quantization of per-pixel output params accumulates along
        # the projector's ~W-pixel ray sums into projection errors many times
        # the measurement noise sigma at high pnm, destroying the physics
        # gradient (measured: SSIM 0.011 bf16 vs 0.195 f32 at 6k iters).
        x = ConvBlock(
            self.final_channels * 2, self.kernel, 1,
            dropout=self.dropout, dtype=jnp.float32,
        )(x.astype(jnp.float32), training=training)
        mean, var = jnp.split(x, 2, axis=-1)
        return mean, var


def latent_shapes(
    x_size: int, y_size: int, in_channels: int, cfg
) -> List[Tuple[int, int, int]]:
    """Static skip shapes (x, y, z) per level, z including the fmm factor."""
    fmm = cfg.feature_maps_multiplier
    shapes = [(x_size, y_size, in_channels * fmm)]
    sx, sy = x_size, y_size
    for i, f in enumerate(cfg.feature_map_counts()):
        sx = -(-sx // cfg.stride_encode)
        sy = -(-sy // cfg.stride_encode)
        shapes.append((sx, sy, f * fmm))
    return shapes


def build_models(x_size: int, y_size: int, in_channels: int, cfg):
    """Construct (encoder, decoder, skip_shapes) from a Config."""
    fmm = cfg.feature_maps_multiplier
    feats = [f * fmm for f in cfg.feature_map_counts()]
    dtype = jnp.dtype(getattr(cfg, "compute_dtype", "float32"))
    prec = getattr(cfg, "conv_precision", None) or None
    if prec is not None and prec not in ("default", "high", "highest"):
        raise ValueError(
            f"conv_precision={prec!r}: use None, 'default', 'high', or 'highest'"
        )
    layout = getattr(cfg, "conv_layout", None) or "NHWC"
    if layout not in ("NHWC", "NCHW"):
        raise ValueError(f"conv_layout={layout!r}: use 'NHWC' or 'NCHW'")
    impl = getattr(cfg, "conv_impl", None) or "direct"
    if impl not in ("direct", "subpixel", "im2col"):
        raise ValueError(
            f"conv_impl={impl!r}: use 'direct', 'subpixel', or 'im2col'"
        )
    enc = Encoder(
        num_blocks=cfg.num_blocks,
        feature_maps=feats,
        kernel=cfg.kernel_size,
        stride=cfg.stride_encode,
        intermediate_layers=cfg.intermediate_layers,
        intermediate_kernel=cfg.intermediate_kernel,
        dropout=cfg.dropout_prob,
        feature_maps_multiplier=fmm,
        norm=getattr(cfg, "norm_type", None) or None,
        dtype=dtype,
        precision=prec,
        layout=layout,
        impl=impl,
    )
    shapes = latent_shapes(x_size, y_size, in_channels, cfg)
    dec = Decoder(
        skip_shapes=tuple(shapes),
        final_channels=1,
        kernel=cfg.kernel_size,
        stride=cfg.stride_encode,
        intermediate_layers=cfg.intermediate_layers,
        intermediate_kernel=cfg.intermediate_kernel,
        dropout=cfg.dropout_prob,
        norm=getattr(cfg, "norm_type", None) or None,
        dtype=dtype,
        precision=prec,
        layout=layout,
        impl=impl,
    )
    return enc, dec, shapes
