"""Invertible compressive maps for training targets (ref: deepxi/map.py).

Each map is a `flax.struct` pytree dataclass: its statistics (per-frequency-bin
mu/sigma, min/max, Laplace scale b, ...) are explicit arrays -- checkpointable
and shardable -- instead of the reference's pickled stateful objects
(ref: deepxi/model.py:90-100). `map`/`inverse` are pure jittable functions.

Composition semantics follow the reference: a map type string may embed the
`Square` and/or `DB` pre-transforms by substring (e.g. the published
`DBNormalCDF` xi map), applied in the order Square -> DB on the forward pass
and inverted in reverse (ref: deepxi/map.py:15-42 and per-class map/inverse).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import struct
from jax.scipy.special import erf, erfinv


def db(x: jnp.ndarray) -> jnp.ndarray:
    """Power -> decibels with the reference's 1e-12 floor (ref: deepxi/map.py:62-73)."""
    return 10.0 * jnp.log10(jnp.maximum(x, 1e-12))


def db_inverse(x_db: jnp.ndarray) -> jnp.ndarray:
    """Decibels -> power (ref: deepxi/map.py:75-85)."""
    return jnp.power(10.0, x_db / 10.0)


class _PreTransform:
    """Shared Square/DB pre-transform plumbing; `square`/`use_db` are static fields."""

    def _pre(self, x):
        if self.square:
            x = jnp.square(x)
        if self.use_db:
            x = db(x)
        return x

    def _post_inverse(self, x):
        if self.use_db:
            x = db_inverse(x)
        if self.square:
            x = jnp.sqrt(x)
        return x


@struct.dataclass
class Linear(_PreTransform):
    """Identity map (ref: deepxi/map.py:97-123)."""
    square: bool = struct.field(pytree_node=False, default=False)
    use_db: bool = struct.field(pytree_node=False, default=False)

    def map(self, x):
        return x

    def inverse(self, x_bar):
        return x_bar

    def with_stats(self, sample):
        return self


@struct.dataclass
class Square(_PreTransform):
    """x^2 (optionally in dB) (ref: deepxi/map.py:125-155)."""
    square: bool = struct.field(pytree_node=False, default=True)
    use_db: bool = struct.field(pytree_node=False, default=False)

    def map(self, x):
        return self._pre(x)

    def inverse(self, x_bar):
        return self._post_inverse(x_bar)

    def with_stats(self, sample):
        return self


@struct.dataclass
class DB(_PreTransform):
    """Decibel map (ref: deepxi/map.py:192-218)."""
    square: bool = struct.field(pytree_node=False, default=False)
    use_db: bool = struct.field(pytree_node=False, default=True)

    def map(self, x):
        return self._pre(x)

    def inverse(self, x_bar):
        return self._post_inverse(x_bar)

    def with_stats(self, sample):
        return self


@struct.dataclass
class Clip(_PreTransform):
    """Clip to [min, max], optionally Square/DB afterwards (ref: deepxi/map.py:157-190)."""
    square: bool = struct.field(pytree_node=False, default=False)
    use_db: bool = struct.field(pytree_node=False, default=False)
    min: float = 0.0
    max: float = 1.0

    def map(self, x):
        x_bar = jnp.clip(x, self.min, self.max)
        if self.square:
            x_bar = jnp.square(x_bar)
        if self.use_db:
            x_bar = db(x_bar)
        return x_bar

    def inverse(self, x_bar):
        if self.use_db:
            x_bar = db_inverse(x_bar)
        if self.square:
            x_bar = jnp.sqrt(x_bar)
        return x_bar

    def with_stats(self, sample):
        return self


@struct.dataclass
class Logistic(_PreTransform):
    """Logistic map 1/(1+exp(-k(x-x0))) (ref: deepxi/map.py:220-255)."""
    square: bool = struct.field(pytree_node=False, default=False)
    use_db: bool = struct.field(pytree_node=False, default=False)
    k: float = 1.0
    x_0: float = 0.0

    def map(self, x):
        x = self._pre(x)
        return 1.0 / (1.0 + jnp.exp(-self.k * (x - self.x_0)))

    def inverse(self, x_bar):
        v = jnp.log(jnp.maximum(1.0 / x_bar - 1.0, 1e-12))
        x = self.x_0 - v / self.k
        return self._post_inverse(x)

    def with_stats(self, sample):
        return self


@struct.dataclass
class Standardise(_PreTransform):
    """Standard-normal scaling with per-bin mu/sigma (ref: deepxi/map.py:257-301)."""
    square: bool = struct.field(pytree_node=False, default=False)
    use_db: bool = struct.field(pytree_node=False, default=False)
    mu: Optional[jnp.ndarray] = None
    sigma: Optional[jnp.ndarray] = None

    def map(self, x):
        return (self._pre(x) - self.mu) / self.sigma

    def inverse(self, x_bar):
        return self._post_inverse(x_bar * self.sigma + self.mu)

    def with_stats(self, sample):
        t = self._pre(sample)
        return self.replace(mu=jnp.mean(t, axis=0), sigma=jnp.std(t, axis=0))


@struct.dataclass
class MinMaxScaling(_PreTransform):
    """Min-max scaling to [0, 1] with clipping (ref: deepxi/map.py:303-350)."""
    square: bool = struct.field(pytree_node=False, default=False)
    use_db: bool = struct.field(pytree_node=False, default=False)
    min: Optional[jnp.ndarray] = None
    max: Optional[jnp.ndarray] = None

    def map(self, x):
        x_bar = (self._pre(x) - self.min) / (self.max - self.min)
        return jnp.clip(x_bar, 0.0, 1.0)

    def inverse(self, x_bar):
        return self._post_inverse(x_bar * (self.max - self.min) + self.min)

    def with_stats(self, sample):
        t = self._pre(sample)
        return self.replace(min=jnp.min(t, axis=0), max=jnp.max(t, axis=0))


@struct.dataclass
class NormalCDF(_PreTransform):
    """Normal-CDF map -- the published `DBNormalCDF` xi map when use_db=True
    (ref: deepxi/map.py:352-402). Forward: 0.5(1 + erf((x-mu)/(sigma sqrt 2))).
    Inverse: mu + sigma sqrt(2) erfinv(2 x_bar - 1)."""
    square: bool = struct.field(pytree_node=False, default=False)
    use_db: bool = struct.field(pytree_node=False, default=False)
    mu: Optional[jnp.ndarray] = None
    sigma: Optional[jnp.ndarray] = None

    def map(self, x):
        x = self._pre(x)
        return 0.5 * (1.0 + erf((x - self.mu) / (self.sigma * jnp.sqrt(2.0))))

    def inverse(self, x_bar):
        x = self.mu + self.sigma * jnp.sqrt(2.0) * erfinv(2.0 * x_bar - 1.0)
        return self._post_inverse(x)

    def with_stats(self, sample):
        t = self._pre(sample)
        return self.replace(mu=jnp.mean(t, axis=0), sigma=jnp.std(t, axis=0))


@struct.dataclass
class LaplaceCDF(_PreTransform):
    """Laplace-CDF map with location `loc` and fitted right-tail scale b
    (ref: deepxi/map.py:404-502)."""
    square: bool = struct.field(pytree_node=False, default=False)
    use_db: bool = struct.field(pytree_node=False, default=False)
    loc: float = 0.0
    b: Optional[jnp.ndarray] = None

    @staticmethod
    def _cdf(x, loc, b):
        v = x - loc
        return 0.5 + 0.5 * jnp.sign(v) * (1.0 - jnp.exp(-jnp.abs(v) / b))

    @staticmethod
    def _cdf_inverse(c, loc, b):
        v = c - 0.5
        return loc - b * jnp.sign(v) * jnp.log(1.0 - 2.0 * jnp.abs(v))

    def map(self, x):
        return self._cdf(self._pre(x), self.loc, self.b)

    def inverse(self, x_bar):
        return self._post_inverse(self._cdf_inverse(x_bar, self.loc, self.b))

    def with_stats(self, sample):
        t = self._pre(sample)
        # Per-bin mean of the right tail above loc (ref: deepxi/map.py:445-460).
        mask = t > self.loc
        tail_sum = jnp.sum(jnp.where(mask, t - self.loc, 0.0), axis=0)
        tail_cnt = jnp.maximum(jnp.sum(mask, axis=0), 1)
        return self.replace(b=tail_sum / tail_cnt)


@struct.dataclass
class TruncatedLaplaceCDF(_PreTransform):
    """Laplace CDF renormalised to [lower, upper] (ref: deepxi/map.py:504-574)."""
    square: bool = struct.field(pytree_node=False, default=False)
    use_db: bool = struct.field(pytree_node=False, default=False)
    loc: float = 0.0
    lower: float = -40.0
    upper: float = 40.0
    b: Optional[jnp.ndarray] = None

    def map(self, x):
        x = self._pre(x)
        c_l = LaplaceCDF._cdf(self.lower, self.loc, self.b)
        c_u = LaplaceCDF._cdf(self.upper, self.loc, self.b)
        c = LaplaceCDF._cdf(x, self.loc, self.b)
        x_bar = (c - c_l) / (c_u - c_l)
        x_bar = jnp.where(x < self.lower, jnp.zeros_like(x), x_bar)
        x_bar = jnp.where(x > self.upper, jnp.ones_like(x), x_bar)
        return x_bar

    def inverse(self, x_bar):
        c_l = LaplaceCDF._cdf(self.lower, self.loc, self.b)
        c_u = LaplaceCDF._cdf(self.upper, self.loc, self.b)
        c = x_bar * (c_u - c_l) + c_l
        return self._post_inverse(LaplaceCDF._cdf_inverse(c, self.loc, self.b))

    def with_stats(self, sample):
        t = self._pre(sample)
        mask = (t > self.loc) & (t < self.upper)
        tail_sum = jnp.sum(jnp.where(mask, t - self.loc, 0.0), axis=0)
        tail_cnt = jnp.maximum(jnp.sum(mask, axis=0), 1)
        return self.replace(b=tail_sum / tail_cnt)


@struct.dataclass
class UniformCDF(_PreTransform):
    """Uniform-CDF map on [a, b] (ref: deepxi/map.py:576-612)."""
    square: bool = struct.field(pytree_node=False, default=False)
    use_db: bool = struct.field(pytree_node=False, default=False)
    a: float = 0.0
    b: float = 1.0

    def map(self, x):
        return (x - self.a) / (self.b - self.a)

    def inverse(self, x_bar):
        return x_bar * (self.b - self.a) + self.a

    def with_stats(self, sample):
        return self


def map_selector(map_type: str, params: Optional[Sequence] = None):
    """Build a map from its type string, reference-compatible
    (ref: deepxi/map.py:15-42). `DB`/`Square` substrings select pre-transforms;
    `params` carries the per-map parameters in the reference's order.
    """
    square = "Square" in map_type
    use_db = "DB" in map_type
    p = params if params is not None else []
    if not isinstance(p, (list, tuple)):
        p = [p]

    if map_type == "Linear":
        return Linear()
    if map_type == "DB":
        return DB()
    if "Clip" in map_type:
        return Clip(square=square, use_db=use_db, min=float(p[0]), max=float(p[1]))
    if "Logistic" in map_type:
        return Logistic(square=square, use_db=use_db, k=float(p[0]), x_0=float(p[1]))
    if "Standardise" in map_type:
        return Standardise(square=square, use_db=use_db)
    if "MinMaxScaling" in map_type:
        return MinMaxScaling(square=square, use_db=use_db)
    if "NormalCDF" in map_type:
        return NormalCDF(square=square, use_db=use_db)
    if "TruncatedLaplaceCDF" in map_type:
        return TruncatedLaplaceCDF(square=square, use_db=use_db, loc=float(p[0]),
                                   lower=float(p[1]), upper=float(p[2]))
    if "LaplaceCDF" in map_type:
        return LaplaceCDF(square=square, use_db=use_db, loc=float(p[0]))
    if "UniformCDF" in map_type:
        # The reference crashes on omitted params (`a, b = self.params` with
        # None, deepxi/map.py:597); here the class defaults [0, 1] apply
        # instead (defect not reproduced).
        if len(p) >= 2:
            return UniformCDF(square=square, use_db=use_db,
                              a=float(p[0]), b=float(p[1]))
        return UniformCDF(square=square, use_db=use_db)
    if "Square" in map_type:
        return Square(use_db=use_db)
    raise ValueError(f"Invalid map_type: {map_type!r}")
