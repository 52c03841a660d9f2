"""VMEM-resident Winograd F(2x2,3x3) conv kernel (Pallas TPU).

The pure-XLA Winograd in ops/winograd.py LOSES 2x end-to-end: its 16
stride-2 slice planes and f32 V/M tensors round-trip HBM. This kernel keeps
every transform in VMEM — per image the activation is read once and the
result written once; only the MAC-reduced batched matmuls touch the MXU.

Mosaic-friendliness is bought with a quadrant decomposition done OUTSIDE
the kernel (one XLA relayout pass each way):

    xq[s][t] = pad(x)[:, s::2, t::2, :]        s,t in {0,1}

Inside the kernel the Winograd input plane d[p][q] (p,q in 0..3) is then the
CONTIGUOUS slice xq[p%2][q%2][p//2 : p//2+TH, q//2 : q//2+TW] — no strided
VMEM access anywhere. Outputs come back as four quadrant planes that XLA
re-interleaves (pure layout op).

Per grid step (one batch image):
    T[i][q] = sum_p BT[i,p] d[p][q]            adds only
    V[i][j] = sum_q BT[j,q] T[i][q]            adds only
    M[n]    = V[n] @ U[n]    n = 4i+j          MXU, fp32 accumulate
    Yq[a][b] += AT[a,i] AT[b,j] M[n]           adds only
with U = G w G^T (f32, computed outside, loop-invariant under the DDIM
scan). bf16 pointwise matmuls, f32 transforms/accumulation — the same
precision contract as XLA's direct conv on bf16.

MEASURED RESULT (v5e, tools/bench_wino_pallas.py, 200-conv chains): the
VMEM-resident kernel still LOSES to XLA's direct conv — 0.314 vs
0.282 ms (b2 64x64 320ch), 0.379 vs 0.235 (b2 32x32 640ch), 1.41 vs
0.91 (b16 64x64 320ch). The add-only BT/AT transforms are ~64 VPU passes
over the tile set, and the VPU:MXU throughput ratio on TPU is low enough
that they cost more than the 2.25x MAC saving returns. Together with the
pure-XLA variant's 2x loss this closes the question: Winograd does not
pay on TPU at SD shapes — direct MXU conv is the right default. Kept as
a documented experiment; not wired into any model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clap2diffusion_tpu.ops.winograd import _AT, _G

VMEM_LIMIT = 100 * 1024 * 1024  # v5e/v5p have 128MB physical


def _bt_rows(vec):
    """[4 arrays] -> BT @ vec (coefficients 0/±1: adds only)."""
    return [
        vec[0] - vec[2],
        vec[1] + vec[2],
        vec[2] - vec[1],
        vec[1] - vec[3],
    ]


def _at_rows(vec):
    return [
        vec[0] + vec[1] + vec[2],
        vec[1] - vec[2] - vec[3],
    ]


def _kernel(xee, xeo, xoe, xoo, u_ref, oee, oeo, ooe, ooo, *, th, tw, cin,
            cout, out_dtype):
    xq = {(0, 0): xee, (0, 1): xeo, (1, 0): xoe, (1, 1): xoo}

    def d(p, q):
        src = xq[(p % 2, q % 2)][0]  # [THq, TWq, C]
        sl = src[p // 2:p // 2 + th, q // 2:q // 2 + tw, :]
        return sl.reshape(th * tw, cin).astype(jnp.float32)

    # T[i][q] then V[i][j], all in VMEM
    t = [_bt_rows([d(p, q) for p in range(4)]) for q in range(4)]
    # t[q][i]
    acc = [[None, None] for _ in range(2)]
    for i in range(4):
        v_i = _bt_rows([t[q][i] for q in range(4)])  # over q -> V[i][j]
        for j in range(4):
            u = u_ref[4 * i + j]  # [C, Co]
            m = jnp.dot(
                v_i[j].astype(u.dtype), u, preferred_element_type=jnp.float32
            )  # [TH*TW, Co]
            for a in range(2):
                ca = _AT[a, i]
                if ca == 0.0:
                    continue
                for b in range(2):
                    cb = _AT[b, j]
                    if cb == 0.0:
                        continue
                    contrib = m if ca * cb == 1.0 else -m
                    acc[a][b] = contrib if acc[a][b] is None else acc[a][b] + contrib

    outs = {(0, 0): oee, (0, 1): oeo, (1, 0): ooe, (1, 1): ooo}
    for a in range(2):
        for b in range(2):
            outs[(a, b)][0] = acc[a][b].reshape(th, tw, cout).astype(out_dtype)


def eligible(x_shape, cin: int, cout: int) -> bool:
    b, h, w, _ = x_shape
    if h % 2 or w % 2 or h < 4 or w < 4:
        return False
    th, tw = h // 2, w // 2
    if (th * tw) % 8:  # sublane alignment of the flattened tile dim
        return False
    # VMEM estimate: quadrants + U + T set + accumulators + outputs
    quad = 4 * (th + 1) * (tw + 1) * cin * 2
    u = 16 * cin * cout * 4
    t_set = 16 * th * tw * cin * 4
    accs = 4 * th * tw * cout * 4 + th * tw * cout * 4
    outs = 4 * th * tw * cout * 2
    return (quad + u + t_set + accs + outs) * 1.3 < VMEM_LIMIT


def conv3x3_winograd_pallas(x: jax.Array, kernel: jax.Array,
                            bias: jax.Array | None = None) -> jax.Array:
    """NHWC 3x3 stride-1 SAME conv, Winograd F(2x2,3x3) in one Pallas pass.

    x: [B, H, W, Cin] (H, W even), kernel: [3, 3, Cin, Cout].
    """
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    th, tw = h // 2, w // 2

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # quadrants: [B, TH+1, TW+1, C] each (H+2 = 2*(TH+1))
    xq = [[jax.lax.slice(xp, (0, s, t, 0), (b, h + 2, w + 2, cin), (1, 2, 2, 1))
           for t in range(2)] for s in range(2)]

    u = jnp.einsum(
        "ip,pqco,jq->ijco", _G, kernel.astype(jnp.float32), _G,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(16, cin, cout).astype(x.dtype)

    qs = th + 1
    qt = tw + 1
    quad_spec = pl.BlockSpec((1, qs, qt, cin), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, th, tw, cout), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    flops = 2 * b * 16 * th * tw * cin * cout
    outs = pl.pallas_call(
        functools.partial(_kernel, th=th, tw=tw, cin=cin, cout=cout,
                          out_dtype=x.dtype),
        out_shape=tuple(
            jax.ShapeDtypeStruct((b, th, tw, cout), x.dtype) for _ in range(4)
        ),
        grid=(b,),
        in_specs=[quad_spec] * 4 + [
            pl.BlockSpec((16, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec,) * 4,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(b * (h + 2) * (w + 2) * cin
                            + 16 * cin * cout + b * h * w * cout)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(xq[0][0], xq[0][1], xq[1][0], xq[1][1], u)

    # re-interleave quadrants: out[:, 2r+a, 2c+b] = outs[2a+b][:, r, c]
    y = jnp.stack(outs)  # [4, B, TH, TW, Co]
    y = y.reshape(2, 2, b, th, tw, cout).transpose(2, 3, 0, 4, 1, 5)
    y = y.reshape(b, h, w, cout)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
