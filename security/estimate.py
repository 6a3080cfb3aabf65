#!/usr/bin/env python
"""Lattice attack-cost estimator (BKZ sieving/enumeration, hybrid + quantum
variants, NTRU-Prime style) — pure-Python port of the reference's Sage tool
``/root/reference/security/estimate.sage:1-318``.

Same interface:  echo "761 4591 286 quotient" | python estimate.py
                 echo "761 4591 250 product"  | python estimate.py

Offline parameter validation only — not part of the proving runtime.
All the reference's caveat structure (UNDER/OVER notes) applies unchanged;
formulas are translated 1:1 (RR -> float, RealDistribution('beta') ->
regularized incomplete beta CDF).
"""

from __future__ import annotations

import math
import sys
from functools import lru_cache

try:
    from scipy.special import betainc as _betainc

    def beta_cdf(a: float, b: float, x: float) -> float:
        if x <= 0.0:
            return 0.0
        if x >= 1.0:
            return 1.0
        return float(_betainc(a, b, x))
except ImportError:  # pragma: no cover - scipy is in the base image
    def beta_cdf(a: float, b: float, x: float) -> float:
        # fallback: numeric integration of the beta pdf
        if x <= 0.0:
            return 0.0
        if x >= 1.0:
            return 1.0
        n = 4096
        lognorm = (math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b))
        total = 0.0
        for i in range(n):
            t = (i + 0.5) * x / n
            total += math.exp((a - 1) * math.log(t)
                              + (b - 1) * math.log1p(-t) - lognorm)
        return total * x / n


def partialsums(xs):
    out, s = [], 0.0
    for x in xs:
        s += x
        out.append(s)
    return out


@lru_cache(maxsize=None)
def enum_cost(b: int) -> float:
    """estimate.sage:33-38"""
    e1 = 0.125 * b * math.log2(b) - 0.547 * b + 10.4
    e2 = 0.1839 * b * math.log2(b) - 0.995 * b + 16.25
    return min(e1, e2)


def qenum(b: int) -> float:
    return 0.5 * enum_cost(b)


def sieve(b: int) -> float:
    return 0.29248125036 * b


def sieverealcost(b: int) -> float:
    return 0.39624062518 * b - 5


def qsieve(b: int) -> float:
    return 0.265 * b


ESTIMATES = (
    ("nonq", "sieving", "free", sieve),
    ("nonq", "sieving", "real", sieverealcost),
    ("nonq", "enumeration", "free", enum_cost),
    ("nonq", "enumeration", "real", enum_cost),
    ("quantum", "sieving", "free", qsieve),
    ("quantum", "sieving", "real", sieverealcost),
    ("quantum", "enumeration", "free", qenum),
    ("quantum", "enumeration", "real", qenum),
)


@lru_cache(maxsize=None)
def choose(n: int, k: int) -> float:
    if k < 0 or k > n:
        return 0.0
    return float(math.comb(n, k))


@lru_cache(maxsize=None)
def delta(b: int) -> float:
    """Root Hermite factor (estimate.sage:73-77)."""
    return (b * (math.pi * b) ** (1.0 / b)
            / (2 * math.pi * math.e)) ** (1.0 / (2 * (b - 1)))


def amplify(prob: float, tries: int) -> float:
    """1 - (1-prob)^tries, numerically stable (estimate.sage:79-82)."""
    if tries == 1:
        return prob
    if prob <= 0.0:
        return 0.0
    if prob >= 1.0:
        return 1.0
    return -math.expm1(math.log1p(-prob) * tries)


def _is_prime(n: int) -> bool:
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, r = n - 1, 0
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


def run(p: int, q: int, w: int, quotient: bool, out=sys.stdout):
    best = {}

    def setbest(tag, lgcost, notes):
        best[tag] = (lgcost, notes)

    equivalence = p if quotient else 1

    lastneededforce = 0
    for force in range(0, p):
        if force > 20 and force > 2 * lastneededforce:
            break
        if force > 20 and force % 10:
            continue
        if force > 100 and force % 20:
            continue
        if force > 400 and force % 40:
            continue

        probforce = choose(p - force, w) / choose(p, w)
        probforce = amplify(probforce, equivalence)

        spositions = p - force
        if not quotient:
            spositions += 1

        samples = p if quotient else 2 * p

        for m in range(40, samples + 1, 10):
            d = spositions + m

            # ----- non-hybrid attacks (estimate.sage:119-141)
            for scale in (1.0, math.sqrt(2 * p / (3.0 * w)),
                          math.sqrt(2 * m / (3.0 * w))):
                volume_log = spositions * math.log(scale) + m * math.log(q)
                target_log = 0.5 * math.log(w * scale**2 + 2 * m / 3.0) \
                    - volume_log / d

                for blocksize in range(40, m + 1):
                    dl = math.log(delta(blocksize))
                    rhs_log = (2 * blocksize - d) * dl \
                        + 0.5 * math.log(d / blocksize)
                    if target_log <= rhs_log:
                        if probforce <= 0:
                            continue
                        lgprob = math.log2(probforce)
                        for quantum, eors, memcost, lgsvp in ESTIMATES:
                            lgcostlattice = lgsvp(blocksize)
                            lgcost = lgcostlattice - lgprob
                            for hybrid in ("nonh", "hybrid"):
                                tag = (hybrid, quantum, eors, memcost)
                                if tag not in best or lgcost < best[tag][0]:
                                    notes = (
                                        f"force {force} lgprobforce "
                                        f"{lgprob:.6f} m {m} blocksize "
                                        f"{blocksize} lgcostlattice "
                                        f"{lgcostlattice:.6f} delta "
                                        f"{delta(blocksize):.6f} scale "
                                        f"{scale:.6f}")
                                    setbest(tag, lgcost, notes)
                                    lastneededforce = force

            # ----- hybrid attacks (estimate.sage:145-295)
            if m % 40 == 0 and force == 0:
                for sigma in range(0, spositions, 40):
                    if sigma == 0:
                        continue
                    sigma1 = sigma // 2
                    sigma2 = sigma - sigma1

                    cost0 = [2**i * choose(sigma, i) for i in range(sigma + 1)]
                    cost1 = [2**i * choose(sigma1, i) for i in range(sigma1 + 1)]
                    cost2 = [2**i * choose(sigma2, i) for i in range(sigma2 + 1)]
                    prob0 = [choose(sigma, i) * choose(p - sigma, w - i)
                             / choose(p, w) for i in range(sigma + 1)]
                    qcost0 = [2**i * choose(sigma, i)
                              * (choose(p - sigma, w - i)
                                 / (2**i * choose(p, w))) ** (2.0 / 3.0)
                              for i in range(sigma + 1)]

                    cost0sum = partialsums(cost0)
                    cost1sum = partialsums(cost1)
                    cost2sum = partialsums(cost2)
                    prob0sum = partialsums(prob0)
                    qcost0sum = partialsums(qcost0)

                    prob12 = {(i1, i2):
                              choose(sigma1, i1) * choose(sigma2, i2)
                              * choose(p - sigma1 - sigma2, w - i1 - i2)
                              / choose(p, w)
                              for i1 in range(sigma1 + 1)
                              for i2 in range(sigma2 + 1)}
                    probL = [sum(prob12[i1, j] for i1 in range(j + 1))
                             + sum(prob12[j, i2] for i2 in range(j))
                             for j in range(sigma1 + 1)]
                    probLsum = partialsums(probL)

                    minid = d - sigma
                    bdim = minid - m
                    beta_a = (minid - 1) / 2.0
                    beta_b = 0.5

                    for blocksize in range(40, minid, 40):
                        dl = math.log(delta(blocksize))
                        k = min(minid,
                                int(math.floor(math.sqrt(
                                    bdim * math.log(q) / dl))))
                        lengths = [float(q)] * (minid - k)
                        nxt = float(q) ** (1 - bdim / k) \
                            * delta(blocksize) ** (k - 1)
                        for _ in range(k):
                            lengths.append(nxt)
                            nxt /= delta(blocksize) ** 2

                        veclen = math.sqrt(bdim * w / p + 2 * m / 3.0)
                        probnp = 1.0
                        for g in lengths:
                            x = 1 - (g / (2 * veclen)) ** 2
                            probnp *= 1 - beta_cdf(beta_a, beta_b, x)
                            if probnp == 0.0:
                                break
                        if probnp == 0.0:
                            continue
                        probnp = amplify(probnp, equivalence)

                        def consider(tag_costsearch, probsearch, label, imax,
                                     quantum_only=False, mitm=False,
                                     costmitm=0.0):
                            for quantum, eors, memcost, lgsvp in ESTIMATES:
                                if quantum_only and quantum != "quantum":
                                    continue
                                lgcostlattice = lgsvp(blocksize)
                                costlattice = 2.0 ** lgcostlattice
                                prob = probnp * probsearch
                                if prob <= 0:
                                    continue
                                if mitm and memcost == "real":
                                    lgcost = math.log2(
                                        costlattice + costmitm ** 1.5) - 5
                                elif mitm:
                                    lgcost = math.log2(costlattice + costmitm)
                                else:
                                    lgcost = math.log2(
                                        costlattice + tag_costsearch)
                                lgcost -= math.log2(prob)
                                tag = ("hybrid", quantum, eors, memcost)
                                if tag not in best or lgcost < best[tag][0]:
                                    n1 = (f"m {m} blocksize {blocksize} "
                                          f"lgcostlattice {lgcostlattice:.6f}"
                                          f" delta {delta(blocksize):.6f} "
                                          f"sigma {sigma} lgprobnp "
                                          f"{math.log2(probnp):.6f}")
                                    notes = n1 + " " + label % (
                                        imax, math.log2(probsearch),
                                        math.log2(tag_costsearch
                                                  if not mitm else costmitm))
                                    setbest(tag, lgcost, notes)

                        # option 1: simple search
                        for imax in range(0, sigma + 1, 5):
                            probsearch = prob0sum[imax]
                            if probsearch == 0:
                                continue
                            consider(cost0sum[imax], probsearch,
                                     "simple imax %s lgprobsearch %.6f "
                                     "lgcostsearch %.6f", imax)
                            if probsearch > 0.99:
                                break

                        # option 2: quantum search
                        for imax in range(0, sigma + 1, 5):
                            probsearch = prob0sum[imax]
                            if probsearch == 0:
                                continue
                            costsearch = qcost0sum[imax] ** 1.5 / probsearch
                            consider(costsearch, probsearch,
                                     "qsearch imax %s lgprobsearch %.6f "
                                     "lgcostsearch %.6f", imax,
                                     quantum_only=True)
                            if probsearch > 0.99:
                                break

                        # option 3: meet-in-the-middle
                        for imax in range(0, sigma1 + 1, 5):
                            probmitm = probLsum[imax]
                            if probmitm == 0:
                                continue
                            costmitm = cost1sum[imax] + cost2sum[imax]
                            consider(costmitm, probmitm,
                                     "mitm imax %s lgprobmitm %.6f "
                                     "lgcostmitm %.6f", imax, mitm=True,
                                     costmitm=costmitm)
                            if probmitm > 0.99:
                                break

    qorp = "quotient" if quotient else "product"
    for quantum, eors, memcost, _ in ESTIMATES:
        for hybrid in ("nonh", "hybrid"):
            tag = (hybrid, quantum, eors, memcost)
            if tag not in best:
                continue
            lgcost, notes = best[tag]
            out.write(f"q {q} p {p} w {w} {qorp} {hybrid} {quantum} {eors} "
                      f"{memcost} lgcost {lgcost} {notes}\n")
    out.flush()
    return best


def main():
    for line in sys.stdin:
        parts = line.split()
        if len(parts) < 4:
            continue
        p, q, w, qorp = int(parts[0]), int(parts[1]), int(parts[2]), parts[3]
        assert qorp in ("product", "quotient")
        if not _is_prime(p):
            sys.stdout.write("warning: ntru prime requires p to be prime\n")
        if not _is_prime(q):
            sys.stdout.write("warning: ntru prime requires q to be prime\n")
        run(p, q, w, qorp == "quotient")


if __name__ == "__main__":
    main()
