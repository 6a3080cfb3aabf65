"""Parameter derivation for the LaBRADOR proof system.

Re-derives, in pure Python (f64 semantics identical to Rust's), the runtime
constants of the reference implementation:

  * ``find_suitable_prime`` — reference ``constants.rs:45-87`` (the "closest
    prime >= start" fallback actually in use there).
  * ``LabradorParams`` — reference ``RuntimeConstants::new`` at
    ``constants.rs:234-264``, formulas from LaBRADOR §5.4 / Thm 5.1.

Conventions faithfully reproduced (see ``constants.rs:249-254``):
  * ``gamma``, ``gamma_1``, ``gamma_2`` are stored **squared**.
  * ``beta_prime`` is actually **beta-prime squared**.
  * ``b_1 = q**(1/t_1)`` is *truncated* (not rounded), ``constants.rs:245``.

On top of the reference behavior this module adds NTT plumbing that the TPU
build needs: selection of internal NTT-friendly primes (p ≡ 1 mod 2D) used
for exact CRT-based negacyclic convolution (the role concrete-ntt's
``native64::Plan32`` plays in the reference, ``constants.rs:197``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import lru_cache

# Polynomial ring degree: Rq = Zq[X]/(X^D + 1).  Reference ``constants.rs:15``.
D = 64

# Challenge-space constants for D = 64 (reference ``constants.rs:22-23``):
# TAU = ||c||^2 of a challenge, T = operator-norm rejection bound.
TAU = 71.0
T_OPNORM = 15.0

# Number of functions in the families F and F' of the principal relation
# (reference ``constants.rs:26,32``).  Parameterized here, defaults match.
K_DEFAULT = 1
L_DEFAULT = 1

# Default modulus search start: (1 << 13) - 1 → q = 8191 (itself prime).
# Reference ``constants.rs:195``; the commented 2^32-scale alternative at
# ``constants.rs:196`` is supported by passing q_start=(1 << 32) - 1.
Q_START_DEFAULT = (1 << 13) - 1


def _is_prime(n: int) -> bool:
    """Deterministic Miller-Rabin, exact for n < 3,317,044,064,679,887,385,961,981."""
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d = n - 1
    r = 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def find_suitable_prime(start: int) -> int:
    """Smallest prime >= start.  Mirrors reference ``constants.rs:45-87``
    (whose generator-based search is dead code; the live path just walks up
    by 1 testing primality)."""
    q = start
    while True:
        if _is_prime(q):
            return q
        q += 1


def is_ntt_friendly(q: int, d: int = D) -> bool:
    """q ≡ 1 (mod 2d): the negacyclic NTT of length d fully splits mod q.
    Reference sketches this intent in ``is_suitable`` (``constants.rs:189-191``)
    but never enforces it."""
    return q % (2 * d) == 1


@lru_cache(maxsize=None)
def ntt_prime_table(d: int = D, max_val: int = 32513) -> tuple[int, ...]:
    """All primes p <= max_val with p ≡ 1 (mod 2d), descending.

    These are the *internal* CRT primes for exact negacyclic convolution.
    The default cap 32513 (= ops.modmath.P_MAX) keeps p small enough that
    (a) a product of two reduced values is < 2^30 (int32-safe) and (b) the
    int8 two-limb MXU decomposition in ops.modmath is representable.
    """
    out = []
    step = 2 * d
    p = ((max_val - 1) // step) * step + 1
    while p > step:
        if _is_prime(p):
            out.append(p)
        p -= step
    return tuple(out)


def select_crt_primes(q: int, d: int = D, max_accum: int = 1 << 20) -> tuple[int, ...]:
    """Pick internal NTT primes whose product exceeds twice the largest
    possible accumulated negacyclic-convolution coefficient
    ``max_accum * d * (q-1)^2`` (``max_accum`` = longest inner-product
    contraction folded into the NTT domain before reconstruction).

    This makes CRT reconstruction exact — unlike the reference's 2^64
    two's-complement wraparound at ``algebraic.rs:417-419``, which silently
    corrupts results for q ≳ 2^29.  The factor 2 covers the signed range of
    negacyclic wraparound terms.
    """
    bound = 2 * max_accum * d * (q - 1) ** 2
    primes: list[int] = []
    prod = 1
    for p in ntt_prime_table(d):
        if prod > bound:
            break
        primes.append(p)
        prod *= p
    if prod <= bound:
        raise ValueError(f"not enough {d}-NTT primes below 2^15 for q={q}")
    return tuple(primes)


@dataclass(frozen=True)
class LabradorParams:
    """Frozen parameter set: the TPU build's replacement for the reference's
    global-flags + lazy-statics + ``RuntimeConstants`` config soup
    (``constants.rs:8-12, 193-201, 205-265``).

    ``n``: rank (length of each witness vector, in ring elements).
    ``r``: number of witness vectors.
    All derived values follow ``RuntimeConstants::new`` bit-for-bit in f64.
    """

    n: int
    r: int
    q: int = 0  # 0 → derive from q_start
    d: int = D
    k_count: int = K_DEFAULT  # |F|,  reference K
    l_count: int = L_DEFAULT  # |F'|, reference L
    q_start: int = Q_START_DEFAULT
    # --- extensions over the reference (all default to reference behavior):
    # kappa_override: realistic (constant) Ajtai commitment rank instead of
    #   the reference's kappa = n*d (constants.rs:237 hardcodes rank to the
    #   full lattice dimension, making every outer commitment quadratic in
    #   witness size; real Module-SIS binding needs only ~security/log q
    #   rows).  0 keeps the reference rule.
    kappa_override: int = 0
    # exact_digits: digit counts t_1/t_2 = ceil(log_b q) so balanced-digit
    #   decomposition reconstructs exactly (required by recursion); the
    #   reference's round()-based counts (constants.rs:244,246) undershoot.
    exact_digits: bool = False
    # beta_override: explicit witness norm bound (recursion carries the
    #   digit-norm bound of the outer proof instead of deriving beta from q).
    beta_override: int = 0

    # Derived (filled in __post_init__ via object.__setattr__):
    beta_bound: int = field(init=False, default=0)
    std: float = field(init=False, default=0.0)
    b: int = field(init=False, default=0)
    t_1: int = field(init=False, default=0)
    b_1: int = field(init=False, default=0)
    t_2: int = field(init=False, default=0)
    b_2: int = field(init=False, default=0)
    gamma: float = field(init=False, default=0.0)  # squared
    gamma_1: float = field(init=False, default=0.0)  # squared
    gamma_2: float = field(init=False, default=0.0)  # squared
    beta_prime: float = field(init=False, default=0.0)  # squared
    kappa: int = field(init=False, default=0)
    kappa_1: int = field(init=False, default=0)
    kappa_2: int = field(init=False, default=0)
    crt_primes: tuple[int, ...] = field(init=False, default=())

    def __post_init__(self):
        q = self.q if self.q else find_suitable_prime(self.q_start)
        object.__setattr__(self, "q", q)
        n, r, d = self.n, self.r, self.d

        # constants.rs:237-239 — commitment ranks = lattice dimension n*d
        # (or the explicit override; see field docs above).
        kappa = self.kappa_override if self.kappa_override else n * d
        object.__setattr__(self, "kappa", kappa)
        object.__setattr__(self, "kappa_1", kappa)
        object.__setattr__(self, "kappa_2", kappa)

        # constants.rs:241 — beta = floor(sqrt(30/128) * q / 125)
        beta = self.beta_override or \
            math.floor(math.sqrt(30.0 / 128.0) * float(q) / 125.0)
        object.__setattr__(self, "beta_bound", int(beta))
        # constants.rs:242 — gothic s
        std = float(beta) / math.sqrt(float(r * n * d))
        object.__setattr__(self, "std", std)
        # constants.rs:243 — b = round(sqrt(sqrt(12 r tau) * std))
        b = _rust_round(math.sqrt(math.sqrt(12.0 * float(r) * TAU) * std))
        b = max(int(b), 2)  # guard: degenerate tiny-std configs
        object.__setattr__(self, "b", int(b))
        # constants.rs:244 — t1 = round(log2 q / log2 b)
        # (clamped >= 1: at large r*n*d the reference's formulas drive the
        # digit counts to 0 and its own b2 = x^(1/t2) would divide by zero —
        # a latent reference bug at exactly the witness sizes its bench
        # sweep advertises)
        t_1 = max(1, _rust_round(math.log2(float(q)) / math.log2(float(b))))
        object.__setattr__(self, "t_1", int(t_1))
        # constants.rs:245 — b1 = trunc(q^(1/t1))   (truncation, not rounding)
        b_1 = int(float(q) ** (1.0 / float(t_1)))
        object.__setattr__(self, "b_1", b_1)
        # constants.rs:246 — t2 = round(log2(sqrt(24 n d) * std^2) / log2 b)
        t_2 = max(1, _rust_round(
            math.log2(math.sqrt(24.0 * float(n * d)) * std**2)
            / math.log2(float(b))
        ))
        object.__setattr__(self, "t_2", int(t_2))
        # constants.rs:247 — b2 = round((sqrt(24 n d) * std^2)^(1/t2))
        b_2 = _rust_round(
            (math.sqrt(float(24 * n * d)) * std**2) ** (1.0 / float(t_2))
        )
        b_2 = max(int(b_2), 2)
        object.__setattr__(self, "b_2", int(b_2))
        if self.exact_digits:
            # enough balanced digits that b^t covers the full centered range
            # of Zq (exact reconstruction; required by recursion).  The
            # reference's round()-based counts undershoot: e.g. q=8191,
            # b1=9 gives t1=4 but 9^4 = 6561 < q.
            b_1 = max(b_1, 2)
            object.__setattr__(self, "b_1", int(b_1))
            t_1 = _ceil_log(q, b_1)
            t_2 = _ceil_log(q, b_2)
            object.__setattr__(self, "t_1", int(t_1))
            object.__setattr__(self, "t_2", int(t_2))

        # constants.rs:250-254 — NOTE: all four stored SQUARED, faithfully.
        gamma = float(beta * beta) * TAU
        gamma_1 = (float(b_1) ** 2 * float(t_1) / 12.0) * float(r) * float(kappa) * float(d) + (
            float(b_2) ** 2 * float(t_2) / 12.0
        ) * ((float(r) ** 2 + float(r)) / 2.0) * float(d)
        gamma_2 = (float(b_1) ** 2 * float(t_1) / 12.0) * (
            (float(r) ** 2 + float(r)) / 2.0
        ) * float(d)
        beta_prime = (2.0 / float(b) ** 2) * gamma + gamma_1 + gamma_2
        if self.exact_digits:
            # Exact-mode beta'^2: a digit-norm budget every honest
            # transcript satisfies with overwhelming probability, unlike
            # the reference's expectation-level b^2 t/12 estimate
            # (constants.rs:250-253) which honest uniform digits only meet
            # with ~1/2 probability (the digit-square sum concentrates AT
            # that estimate, not below it).  Per digit position we budget
            # min(E[d^2 | uniform], cap^2) where cap is the position's
            # attainable maximum (|digit| <= b//2 by construction, and top
            # positions of a centered value are range-limited), then apply
            # a 4/3 slack — ~80 sigma for the >=10^4-digit streams here,
            # while staying well under the 3x-looser pure worst case.
            # Digit populations (protocol.decompose_*, exact mode):
            #   z: ceil_log_b(q) digits base b over (n, d)
            #   t: t_1 digits base b_1 over (r, kappa, d)
            #   g: t_2 digits base b_2 over the FULL (r, r, d) matrix
            #   h: t_1 digits base b_1 over the FULL (r, r, d) matrix
            # g/h counts are DENSE (r^2, off-diagonals twice): Check 14
            # sums the full symmetric matrices exactly as the reference
            # does (verification.rs:240-255 loops i in 0..R, j in 0..R) —
            # rounds 1-4 budgeted only the triangle here, which realistic
            # big-q witnesses exceed once the g/h share of the sum grows
            # (caught by the round-5 2^14 big-q sweep: measured g/h digit
            # sums were (r^2+r)/2 : r^2 above the triangle budget).
            # (In exact mode Check 14 ALSO enforces ||z||^2 <= 2*gamma
            # directly — the paper's real extraction norm bound, which the
            # digit bound alone cannot express; see verifier.check14.)
            nz = _ceil_log(q, b)
            budget = (
                _digit_budget_sq(q, b, nz, n * d)
                + _digit_budget_sq(q, b_1, t_1, r * kappa * d)
                + _digit_budget_sq(q, b_2, t_2, r * r * d)
                + _digit_budget_sq(q, b_1, t_1, r * r * d)
            )
            bp_int = int(math.ceil(budget * 4.0 / 3.0))
            assert bp_int < 2**53, "beta'^2 exceeds f64 integer range"
            beta_prime = float(bp_int)
        object.__setattr__(self, "gamma", gamma)
        object.__setattr__(self, "gamma_1", gamma_1)
        object.__setattr__(self, "gamma_2", gamma_2)
        object.__setattr__(self, "beta_prime", beta_prime)

        # Longest contraction folded into the NTT domain before CRT
        # reconstruction: the u1 outer commitment accumulates r * t_1 * kappa
        # convolution terms (proofgen.rs:100-132); pad with 2x headroom,
        # floor at 1024 for small configs.
        object.__setattr__(
            self, "crt_primes",
            select_crt_primes(q, d, max_accum=max(2 * r * t_1 * kappa, 1024)),
        )

    # ------------------------------------------------------------------
    @property
    def upper_bound(self) -> int:
        """Number of first-aggregation rounds: min(K, ceil(128/log2 q)).
        Reference ``proofgen.rs:189``/``verification.rs:28``."""
        return min(self.k_count, math.ceil(128.0 / math.log2(float(self.q))))

    @property
    def inv2(self) -> int:
        """2^{-1} mod q (used for the h matrix, ``proofgen.rs:341-346``)."""
        return pow(2, self.q - 2, self.q)

    def summary(self) -> str:
        return (
            f"LabradorParams(n={self.n}, r={self.r}, q={self.q}, d={self.d}, "
            f"beta={self.beta_bound}, std={self.std:.4f}, b={self.b}, "
            f"t1={self.t_1}, b1={self.b_1}, t2={self.t_2}, b2={self.b_2}, "
            f"kappa={self.kappa}, beta'^2={self.beta_prime:.1f}, "
            f"crt_primes={self.crt_primes})"
        )


def _digit_budget_sq(q: int, base: int, ndig: int, count: int) -> float:
    """Expected squared-norm budget for `count` values' balanced base-`base`
    digit streams of length `ndig` (values centered mod q).

    Per position k the budget is count * min(E[d^2] for a uniform residue,
    cap_k^2) where cap_k is the attainable digit maximum at that position:
    |d| <= base//2 always, and the running quotient of a value started in
    [-q/2, q/2] shrinks as m_{k+1} = (m_k + base//2) // base, so top
    positions contribute (almost) nothing.  Upper-bounds the honest
    expectation for every input distribution that is uniform-or-smaller
    per position (uniform mod q, inner products that wrap, small values)."""
    b = int(base)
    e_uniform = sum((v if v <= b // 2 else v - b) ** 2 for v in range(b)) / b
    m = q // 2
    total = 0.0
    for _ in range(int(ndig)):
        cap = min(b // 2, m)
        total += count * min(e_uniform, float(cap * cap))
        m = (m + b // 2) // b
    return total


def _ceil_log(q: int, b: int) -> int:
    """Smallest t with b**t >= q (so centered base-b digits of length t
    represent any centered residue exactly)."""
    t = 1
    v = b
    while v < q:
        v *= b
        t += 1
    return t


def _rust_round(x: float) -> int:
    """Rust f64::round(): round half away from zero (Python's round() is
    banker's rounding, which would diverge on exact .5 values)."""
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))
