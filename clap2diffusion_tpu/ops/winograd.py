"""Winograd F(2x2, 3x3) convolution for the UNet's stride-1 SAME convs.

The device trace (tools/profile_step.py) shows 3x3 convolutions at 57% of a
UNet CFG step, running at 130-185 TF/s — essentially the direct-conv
roofline on v5e. The only way past a roofline is to need fewer FLOPs:
Winograd F(2x2,3x3) computes each 2x2 output tile with 16 multiplies
instead of 36 (2.25x fewer MACs), at the cost of cheap add-only transforms.

Formulation (pure XLA; the MXU work is one batched [16]-major matmul):

    V[i,j] = sum_pq BT[i,p] BT[j,q] d[p,q]     input transform  (adds)
    U      = G w G^T                           filter transform (tiny, and
                                               loop-invariant under the DDIM
                                               lax.scan -> hoisted)
    M[n]   = V[n] @ U[n]   n = 0..15           batched MXU matmul
    Y[a,b] = sum_ij AT[a,i] AT[b,j] M[i,j]     output transform (adds)

Transforms run in float32 (bf16 inputs upcast); the pointwise matmuls run
in the input dtype with f32 accumulation — the same precision contract as
XLA's direct conv on bf16 operands.

MEASURED RESULT (v5e, full 50-step pipeline A/B): the pure-XLA
formulation LOSES — p50 2.565 s vs 1.270 s with direct convs. The 2.25x
MAC saving is swamped by the transform data movement: 16 stride-2 sliced
planes and the f32 V/M tensors round-trip HBM (~12x the activation bytes
of a direct conv), and XLA materializes the slice relayouts. The honest
path to a Winograd win on TPU is a Pallas kernel doing the BT/AT
transforms in VMEM (one HBM read + one write per activation); until that
exists this stays opt-in via C2D_WINOGRAD=1 and the default remains
XLA's direct conv, which measures at 130-185 TF/s here.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# F(2x2, 3x3) transform constants (Lavin & Gray, "Fast Algorithms for
# Convolutional Neural Networks").
_BT = np.array(
    [[1, 0, -1, 0],
     [0, 1, 1, 0],
     [0, -1, 1, 0],
     [0, 1, 0, -1]], dtype=np.float32)
_G = np.array(
    [[1, 0, 0],
     [0.5, 0.5, 0.5],
     [0.5, -0.5, 0.5],
     [0, 0, 1]], dtype=np.float32)
_AT = np.array(
    [[1, 1, 1, 0],
     [0, 1, -1, -1]], dtype=np.float32)


def eligible(x_shape, kernel_shape, strides, padding) -> bool:
    """3x3, stride 1, SAME/((1,1),(1,1)), even H and W."""
    if tuple(kernel_shape[:2]) != (3, 3):
        return False
    if tuple(strides) != (1, 1):
        return False
    if padding not in ("SAME", ((1, 1), (1, 1)), [(1, 1), (1, 1)]):
        return False
    _, h, w, _ = x_shape
    return h % 2 == 0 and w % 2 == 0 and h >= 2 and w >= 2


def conv3x3_winograd(x: jax.Array, kernel: jax.Array,
                     bias: jax.Array | None = None) -> jax.Array:
    """NHWC 3x3 stride-1 SAME conv via Winograd F(2x2,3x3).

    x: [B, H, W, Cin] (H, W even), kernel: [3, 3, Cin, Cout] (flax
    nn.Conv layout), bias: [Cout] or None.
    """
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    th, tw = h // 2, w // 2
    dtype = x.dtype

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(jnp.float32)

    # 16 stride-2 planes d[p][q] = xp[:, 2r+p, 2c+q, :]  -> [B, TH, TW, C]
    d = [[jax.lax.slice(
        xp, (0, p, q, 0), (b, p + 2 * th - 1, q + 2 * tw - 1, cin),
        (1, 2, 2, 1))
        for q in range(4)] for p in range(4)]

    # V[i][j] = sum_pq BT[i,p] BT[j,q] d[p][q] — coefficients are 0/±1,
    # so this expands to pure adds.
    def bt_combine(vec):  # BT @ [4 items]
        return [
            vec[0] - vec[2],
            vec[1] + vec[2],
            vec[2] - vec[1],
            vec[1] - vec[3],
        ]

    rows = [bt_combine([d[p][q] for p in range(4)]) for q in range(4)]
    # rows[q][i] = sum_p BT[i,p] d[p][q]; now combine over q per i
    V = [bt_combine([rows[q][i] for q in range(4)]) for i in range(4)]
    # V[i][j] : [B, TH, TW, C]
    v16 = jnp.stack([V[i][j] for i in range(4) for j in range(4)])
    v16 = v16.reshape(16, b * th * tw, cin).astype(dtype)

    # U = G w G^T per (cin, cout): [4,4,Cin,Cout]; loop-invariant in scan.
    u = jnp.einsum(
        "ip,pqco,jq->ijco", _G, kernel.astype(jnp.float32), _G,
        precision=jax.lax.Precision.HIGHEST,
    )
    u16 = u.reshape(16, cin, cout).astype(dtype)

    m16 = jnp.einsum(
        "ntc,nco->nto", v16, u16, preferred_element_type=jnp.float32
    )  # [16, B*TH*TW, Cout]
    M = m16.reshape(4, 4, b, th, tw, cout)

    # Y[a][b] = sum_ij AT[a,i] AT[b,j] M[i,j] — again pure adds.
    def at_combine(vec):  # AT @ [4 items]
        return [
            vec[0] + vec[1] + vec[2],
            vec[1] - vec[2] - vec[3],
        ]

    cols = [at_combine([M[i, j] for i in range(4)]) for j in range(4)]
    # cols[j][a] = sum_i AT[a,i] M[i,j]
    Y = [at_combine([cols[j][a] for j in range(4)]) for a in range(2)]
    # Y[a][b_] : [B, TH, TW, Cout] -> interleave into [B, H, W, Cout]
    out = jnp.stack(
        [Y[0][0], Y[0][1], Y[1][0], Y[1][1]]
    ).reshape(2, 2, b, th, tw, cout)
    out = out.transpose(2, 3, 0, 4, 1, 5).reshape(b, h, w, cout)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)


def make_conv3x3_module():
    """flax module with nn.Conv's param names ('kernel', 'bias') that
    routes eligible 3x3 convs through Winograd when C2D_WINOGRAD=1;
    otherwise (and for the backward pass) uses lax direct conv."""
    import os

    from flax import linen as nn

    class Conv3x3(nn.Module):
        features: int
        use_winograd_env: str = "C2D_WINOGRAD"

        @nn.compact
        def __call__(self, x):
            # DTYPE CONTRACT (ADVICE r2): params are cast DOWN to x.dtype
            # (unlike nn.Conv, which promotes bf16 inputs to fp32 params).
            # Both the train path (explicit _compute_cast) and serve path
            # feed params and activations in the SAME dtype, so this only
            # differs in unsupported mixed configurations.
            cin = x.shape[-1]
            kernel = self.param(
                "kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.features)
            ).astype(x.dtype)
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,)
            ).astype(x.dtype)
            # Opt-in W8A8 int8 serving path (ops/quant.py). Narrow convs
            # (conv_in 4->320, conv_out ->4) stay fp: no MXU win, and the
            # epsilon head is the most drift-sensitive layer. Takes
            # precedence over the (losing, archival) Winograd experiment.
            from clap2diffusion_tpu.ops import quant

            if quant.conv_eligible(cin, self.features):
                return quant.int8_conv(x, kernel, bias)
            if (
                os.environ.get(self.use_winograd_env) == "1"
                and eligible(x.shape, kernel.shape, (1, 1), "SAME")
            ):
                return conv3x3_winograd(x, kernel, bias)
            return jax.lax.conv_general_dilated(
                x, kernel, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias

    return Conv3x3


Conv3x3 = make_conv3x3_module()
