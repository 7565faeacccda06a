"""Real spherical-harmonics direction encoding (degrees 1..8).

Parity target: the reference shencoder CUDA extension
(/root/reference/shencoder/src/shencoder.cu:28-355) which hard-codes the real SH
polynomials up to degree 8 and outputs degree^2 coefficients for unit
directions in [-1, 1]^3.  Note the default nerf2mesh model does NOT use SH
(encoder_dir is identity — reference network.py:74); this exists for API parity
and for user configs that select it.

Instead of 400 lines of unrolled polynomials we evaluate the standard real SH
basis via the associated-Legendre recurrence — fully vectorized, autodiff gives
the backward (replacing shencoder.cu:359-396).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def sh_output_dim(degree: int) -> int:
    return degree * degree


@partial(jax.jit, static_argnames=("degree",))
def sh_encode(dirs: jax.Array, degree: int = 4) -> jax.Array:
    """Encode unit directions [N, 3] -> [N, degree^2] real SH values.

    Uses the convention of the reference kernel: component order is
    (l, m) = (0,0), (1,-1), (1,0), (1,1), (2,-2) ... i.e. l-major, m ascending.
    """
    assert 1 <= degree <= 8
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]

    # Associated Legendre P_l^m(z) with Condon-Shortley phase omitted,
    # normalized K_l^m = sqrt((2l+1)/(4pi) * (l-m)!/(l+m)!).
    # Real SH: Y_l^0 = K P_l^0(z);  Y_l^{+-m} = sqrt(2) K P_l^m(z) {cos,sin}(m phi).
    L = degree - 1

    # sin^m/cos^m terms via complex-style recurrence on (x + i y):
    # c_m = Re[(x+iy)^m], s_m = Im[(x+iy)^m]
    c = [jnp.ones_like(x)]
    s = [jnp.zeros_like(x)]
    for m in range(1, L + 1):
        c.append(c[-1] * x - s[-1] * y)
        s.append(s[-1] * x + c[-2] * y)

    # P_m^m recurrence: P_0^0 = 1; P_m^m = (2m-1)!! * (sin_theta)^m, but we fold
    # sin_theta^m into c_m/s_m (which already carry (sin_theta)^m via x,y).
    # Work with "semi-normalized" p[l][m] such that
    # Y_l^m = N * p[l][m] * {c_m or s_m}.
    pmm = [jnp.ones_like(z)]
    for m in range(1, L + 1):
        pmm.append(pmm[-1] * -(2 * m - 1))  # includes Condon-Shortley; absorbed below

    out = []
    # storage p[m] evolving over l
    for l in range(0, L + 1):
        row = [None] * (l + 1)
        out.append(row)

    p = {}
    for m in range(0, L + 1):
        p[(m, m)] = pmm[m]
        if m + 1 <= L:
            p[(m + 1, m)] = z * (2 * m + 1) * pmm[m]
        for l in range(m + 2, L + 1):
            p[(l, m)] = (
                (2 * l - 1) * z * p[(l - 1, m)] - (l + m - 1) * p[(l - 2, m)]
            ) / (l - m)

    comps = []
    for l in range(0, L + 1):
        for m in range(-l, l + 1):
            am = abs(m)
            k = math.sqrt(
                (2 * l + 1)
                / (4 * math.pi)
                * math.factorial(l - am)
                / math.factorial(l + am)
            )
            # the Condon-Shortley phase is already carried by pmm's -(2m-1)
            # factors; adding another (-1)^m here would cancel it and flip
            # every odd-m sign vs the reference kernel (shencoder.cu, e.g.
            # outputs[1] = -0.4886*y)
            if m == 0:
                comps.append(k * p[(l, 0)])
            elif m > 0:
                comps.append(math.sqrt(2.0) * k * p[(l, m)] * c[m])
            else:
                comps.append(math.sqrt(2.0) * k * p[(l, am)] * s[am])
    return jnp.stack(comps, axis=-1).astype(jnp.float32)
