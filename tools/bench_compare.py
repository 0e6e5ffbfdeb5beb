#!/usr/bin/env python3
"""Noise-calibrated cross-build bench comparison (r9 verdict ask #5).

Same-code min-of-N ratios on this box historically spread to p90 1.23x,
swamping a bare 1.25x regression threshold. Bench.scala now emits a
per-run SPLIT-HALF self-calibration (`queries_selfratio`: interleaved
odd/even repeats, same code by construction, ratio of their mins) and a
run-level `noise` summary. This tool compares two bench JSONs against
that calibration:

  - ratio = min_new / min_old per shared query
  - noise floor = max of the two runs' own split-half ratio for that
    query (each run knows how noisy IT was on THAT query), with the
    run-level p90 as a lower bound for queries with degenerate splits
  - verdict per query:
      REGRESSION  ratio > max(floor, threshold)  -> a change this large
                  never occurred between same-code halves of either run
                  (>~99% confidence it is real, not scheduler noise)
      WATCH       threshold < ratio <= floor     -> inside the measured
                  same-code noise band; not actionable evidence
      ok          otherwise (improvements reported symmetrically)

Method epochs (r10 verdict ask #1): the r10 sharded-fork harness changed
the measurement method — absolutes from different methods differ by a
uniform fork-warmth offset concentrated in sub-second queries (r10: 47
phantom "regressions" comparing warm-JVM r9 vs sharded r10). Artifacts
now self-describe via a `method` tag (stamped by Bench.scala /
bench_forked.sh); for pre-tag artifacts the method is inferred from
structural fields that only one harness writes (`shard_size` ->
sharded-fork, `forked` -> forked-per-query, else single-jvm). Comparing
across methods is refused unless --force is given, and a --force
comparison is watermarked as method-crossed in every output line.

Shard context (r11 verdict asks #1/#7): even same-method sharded-fork
runs are not comparable for a query whose SHARD CONTEXT changed — who
shares and precedes it in its 12-query JVM sets its JIT-pollution depth
(r11: re-dealt queries moved 1.2-1.9x at code parity). Artifacts now
stamp `shard_of` (query -> shard index); each flagged line is annotated
[SHARD-REDEALT] when the query's co-member set or in-shard position
differs between the two runs — such a flag is composition evidence, not
a regression claim. With the frozen manifest (bench/shard_manifest.json)
shared queries should always be shard-stable.

Usage: python3 tools/bench_compare.py <old.json> <new.json> [threshold=1.15] [--force]
Dev-only tool (driver-side python); not part of the Scala library.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def shard_ctx(d, q):
    """(sorted co-member tuple, in-shard position) for q, or None when
    the artifact predates the shard_of stamp / didn't shard."""
    so = d.get("shard_of")
    if not so or q not in so:
        return None
    members = sorted(m for m, i in so.items() if i == so[q])
    return (tuple(members), members.index(q))


def method_of(d):
    if "method" in d:
        return d["method"]
    if "shard_size" in d:
        return "sharded-fork"
    if d.get("forked"):
        return "forked-per-query"
    return "single-jvm"


def main(old_path, new_path, threshold=1.15, force=False):
    old, new = load(old_path), load(new_path)
    mo, mn = method_of(old), method_of(new)
    if mo != mn:
        print(f"method mismatch: {old_path} is '{mo}', {new_path} is "
              f"'{mn}' — absolutes across harness methods differ by "
              f"fork-warmth offsets, not plan changes (see r10 verdict).")
        if not force:
            print("refusing to compare; rerun with --force to override "
                  "(output will be watermarked METHOD-CROSSED).")
            return 2
        print("--force given: every line below is METHOD-CROSSED "
              "evidence, not a regression claim.\n")
    qo, qn = old["queries"], new["queries"]
    so = old.get("queries_selfratio", {})
    sn = new.get("queries_selfratio", {})
    p90 = max(old.get("noise", {}).get("p90", 1.0),
              new.get("noise", {}).get("p90", 1.0))
    shared = sorted(set(qo) & set(qn))
    regressions, watch, improved = [], [], []
    for q in shared:
        a, b = qo[q], qn[q]
        if a <= 0 or b <= 0:
            continue
        ratio = b / a
        floor = max(so.get(q, 1.0), sn.get(q, 1.0), p90)
        if ratio > max(floor, threshold):
            regressions.append((q, ratio, floor, a, b))
        elif ratio > threshold:
            watch.append((q, ratio, floor, a, b))
        elif 1.0 / ratio > max(floor, threshold):
            improved.append((q, ratio, floor, a, b))
    crossed = " [METHOD-CROSSED]" if mo != mn else ""
    redealt_count = 0
    for tag, rows in (("REGRESSION", regressions), ("WATCH", watch),
                      ("IMPROVED", improved)):
        for q, r, f, a, b in sorted(rows, key=lambda t: -t[1]):
            co, cn = shard_ctx(old, q), shard_ctx(new, q)
            if co is not None and cn is not None and co != cn:
                shard = " [SHARD-REDEALT]"
                redealt_count += 1
            else:
                shard = ""
            print(f"{tag:10s} {q:36s} {a:7.2f}s -> {b:7.2f}s  "
                  f"ratio {r:5.2f}x  noise-floor {f:5.2f}x{crossed}{shard}")
    ta = sum(v for v in qo.values() if v > 0)
    tb = sum(qn[q] for q in shared if qn[q] > 0 and qo.get(q, -1) > 0)
    print(f"\nmethod: {mo} vs {mn}; "
          f"{len(shared)} shared queries; totals {ta:.1f}s -> {tb:.1f}s; "
          f"run noise p90 {p90:.2f}x; "
          f"{len(regressions)} regression(s) above the calibrated floor, "
          f"{len(watch)} inside the noise band, {len(improved)} improved; "
          f"{redealt_count} flagged line(s) shard-redealt")
    return 1 if regressions else 0


if __name__ == "__main__":
    force = "--force" in sys.argv
    argv = [a for a in sys.argv if a != "--force"]
    thr = float(argv[3]) if len(argv) > 3 else 1.15
    sys.exit(main(argv[1], argv[2], thr, force))
