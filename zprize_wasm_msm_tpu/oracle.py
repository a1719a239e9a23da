"""Pure-Python reference oracle: fields, curves, MSM, NTT.

Mirrors the reference's *behavior* (wasmcurves field/curve/MSM semantics)
with plain Python bigints, used only for differential testing of the TPU
kernels (the role wasmcurves' simpler engines play for its optimized one,
e.g. test/batchAffine.js:1210-1222 derives expected MSM results with
timesScalar + add loops).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple


# ---------------------------------------------------------------------------
# field
# ---------------------------------------------------------------------------


class F:
    """Prime field helpers over python ints."""

    def __init__(self, q: int):
        self.q = q

    def add(self, a, b):
        return (a + b) % self.q

    def sub(self, a, b):
        return (a - b) % self.q

    def neg(self, a):
        return (-a) % self.q

    def mul(self, a, b):
        return (a * b) % self.q

    def sqr(self, a):
        return (a * a) % self.q

    def inv(self, a):
        return pow(a, self.q - 2, self.q)

    def sqrt(self, a) -> Optional[int]:
        if a == 0:
            return 0
        if pow(a, (self.q - 1) // 2, self.q) != 1:
            return None
        if self.q % 4 == 3:
            return pow(a, (self.q + 1) // 4, self.q)
        # Tonelli-Shanks
        s, t = 0, self.q - 1
        while t % 2 == 0:
            s += 1
            t //= 2
        z = 2
        while pow(z, (self.q - 1) // 2, self.q) != self.q - 1:
            z += 1
        m, c, w, r = s, pow(z, t, self.q), pow(a, t, self.q), pow(a, (t + 1) // 2, self.q)
        while w != 1:
            i, ww = 0, w
            while ww != 1:
                ww = ww * ww % self.q
                i += 1
            b = pow(c, 1 << (m - i - 1), self.q)
            m, c = i, b * b % self.q
            w = w * c % self.q
            r = r * b % self.q
        return r


# ---------------------------------------------------------------------------
# short Weierstrass curve y^2 = x^3 + a*x + b, Jacobian coordinates
# ---------------------------------------------------------------------------

# Affine points are (x, y) tuples; None is the point at infinity.
Affine = Optional[Tuple[int, int]]


@dataclass
class Curve:
    q: int
    a: int
    b: int
    r: int  # group order
    gx: int
    gy: int

    def __post_init__(self):
        self.F = F(self.q)

    @property
    def g(self) -> Affine:
        return (self.gx, self.gy)

    def is_on_curve(self, p: Affine) -> bool:
        if p is None:
            return True
        x, y = p
        return (y * y - (x * x * x + self.a * x + self.b)) % self.q == 0

    def neg(self, p: Affine) -> Affine:
        if p is None:
            return None
        return (p[0], (-p[1]) % self.q)

    def add(self, p: Affine, s: Affine) -> Affine:
        f, q = self.F, self.q
        if p is None:
            return s
        if s is None:
            return p
        x1, y1 = p
        x2, y2 = s
        if x1 == x2:
            if (y1 + y2) % q == 0:
                return None
            # doubling
            lam = f.mul(f.add(f.mul(3, f.sqr(x1)), self.a), f.inv(f.mul(2, y1)))
        else:
            lam = f.mul(f.sub(y2, y1), f.inv(f.sub(x2, x1)))
        x3 = f.sub(f.sqr(lam), f.add(x1, x2))
        y3 = f.sub(f.mul(lam, f.sub(x1, x3)), y1)
        return (x3, y3)

    def double(self, p: Affine) -> Affine:
        return self.add(p, p)

    def mul(self, p: Affine, k: int) -> Affine:
        k %= self.r
        acc: Affine = None
        add = p
        while k:
            if k & 1:
                acc = self.add(acc, add)
            add = self.add(add, add)
            k >>= 1
        return acc

    def msm(self, points: Sequence[Affine], scalars: Sequence[int]) -> Affine:
        """Naive double-and-add MSM — the differential oracle."""
        acc: Affine = None
        for p, k in zip(points, scalars):
            acc = self.add(acc, self.mul(p, k))
        return acc


# ---------------------------------------------------------------------------
# NTT oracle over Fr
# ---------------------------------------------------------------------------


def ntt(values: List[int], r: int, root: int) -> List[int]:
    """O(n^2) DFT over Z_r with given primitive n-th root (oracle only)."""
    n = len(values)
    return [
        sum(values[j] * pow(root, i * j, r) for j in range(n)) % r for i in range(n)
    ]
