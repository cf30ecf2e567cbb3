"""Bench-commit gate (VERDICT r13 item 5 — "gate solo-run commits on
the io probe").

Decides whether a solo ``python bench.py`` run's detail sidecar was
taken on a committable window. The BENCHLOG protocol already rejected
on the pre-run load gate and on the probe-divergence signature; the r13
committed run slipped through on an io-3.765 window (steady ~1.6) and
needed per-entry adjudication of the io-heavy trio after the fact —
this adds the io probe to the reject signature, machine-readably.

Checks, in order:

1. ``calibration.gate.degraded`` — the pre-run host-quiet gate
   (1-minute load, scratch write+fsync+read, memory-bandwidth probe).
2. Probe divergence — ``host_factor`` and ``host_factor_cpu`` on
   opposite sides of 1.0 by more than 15% each (the r11 dirty-window
   signature: shuffle probe says slower host, cpu probe says faster).
3. IO window — the run's ``calibration.io`` probe against the steady
   band: median of the three smallest io probes across committed
   ``BENCH_DETAIL_r*.json`` priors; reject when this run reads more
   than ``IO_REJECT_FACTOR`` (1.5×) above it. r12 (3.411) and the r13
   builder window (3.765) both fail this; every clean window
   (1.45-1.67) passes.

Usage: ``python tools/commit_bench.py [BENCH_DETAIL_rNN.json]``
(default: the highest-numbered detail in the repo root). Exit 0 =
committable; exit 1 = refuse, reasons printed.
"""

import json
import os
import re
import sys

IO_REJECT_FACTOR = 1.5
DIVERGENCE_BAND = 0.15


def steady_io(here: str, exclude: str | None = None) -> float | None:
    """Median of the three smallest io probes across committed prior
    detail sidecars — the machine's demonstrated quiet-disk band."""
    vals = []
    for f in sorted(os.listdir(here)):
        if not re.fullmatch(r"BENCH_DETAIL_r\d+\.json", f) or f == exclude:
            continue
        try:
            with open(os.path.join(here, f)) as fh:
                io = (json.load(fh).get("calibration") or {}).get("io")
        except (OSError, ValueError):
            continue
        if io:
            vals.append(float(io))
    if not vals:
        return None
    low3 = sorted(vals)[:3]
    return low3[len(low3) // 2]


def gate(detail: dict, steady: float | None) -> list[str]:
    """Return the reject reasons for this run's window (empty = OK)."""
    reasons = []
    cal = detail.get("calibration") or {}
    if (cal.get("gate") or {}).get("degraded"):
        reasons.append(
            "pre-run host-quiet gate degraded (load/scratch/mem bound "
            "exceeded on both samples)"
        )
    hf, hfc = detail.get("host_factor"), detail.get("host_factor_cpu")
    if hf and hfc and (
        (hf > 1 + DIVERGENCE_BAND and hfc < 1 - DIVERGENCE_BAND)
        or (hf < 1 - DIVERGENCE_BAND and hfc > 1 + DIVERGENCE_BAND)
    ):
        reasons.append(
            f"probe divergence: host_factor {hf} and host_factor_cpu "
            f"{hfc} point in opposite directions — the dirty-window "
            "signature (BENCHLOG r11)"
        )
    io = cal.get("io")
    if io and steady and io > IO_REJECT_FACTOR * steady:
        reasons.append(
            f"io window degraded: probe {io} > {IO_REJECT_FACTOR}x the "
            f"steady band {steady} — the r12/r13 shape that inflated "
            "the write-heavy trio; re-run on a quiet disk window"
        )
    return reasons


def main() -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        cands = sorted(
            f for f in os.listdir(here)
            if re.fullmatch(r"BENCH_DETAIL_r\d+\.json", f)
        )
        if not cands:
            print("no BENCH_DETAIL_r*.json found")
            return 1
        path = os.path.join(here, cands[-1])
    with open(path) as fh:
        detail = json.load(fh)
    steady = steady_io(here, exclude=os.path.basename(path))
    reasons = gate(detail, steady)
    name = os.path.basename(path)
    for r in reasons:
        print(f"REFUSE {name}: {r}")
    if not reasons:
        io = (detail.get("calibration") or {}).get("io")
        print(
            f"COMMITTABLE {name}: gate clean, probes agree, "
            f"io {io} within {IO_REJECT_FACTOR}x of steady {steady}"
        )
    return 1 if reasons else 0


if __name__ == "__main__":
    raise SystemExit(main())
