"""Round-open evidence-chain guard (VERDICT r13 item 2 — "mechanize
the evidence chain, last recurrence").

Fails (exit 1) when any round sidecar present in the working tree —
``BENCH_r*.json``, ``CORRECTNESS_r*.json``, ``BENCH_DETAIL_r*.json`` —
is untracked, or differs from HEAD, without a BENCHLOG.md entry naming
that exact filename (the entry is where the builder records which
artifact — builder solo run vs driver round-end run — is
authoritative). Three rounds running (ADVICE r11 item 2, VERDICT r12
item 4, VERDICT r13 missing #1) the round's sidecars reached HEAD one
round late; this makes the gap a failing check instead of prose.

Usage: ``python tools/open_round.py [repo_dir]`` — run at round open
and before any round-close commit. Also wired into the test suite
(tests/test_bench_protocol.py) so a silent drift fails pytest.
"""

import os
import re
import subprocess
import sys

_SIDE = re.compile(r"^(BENCH|CORRECTNESS|BENCH_DETAIL)_r\d+\.json$")


def check(repo: str) -> list[str]:
    """Return the list of evidence-chain problems (empty = clean)."""
    try:
        tracked = set(
            subprocess.run(
                ["git", "-C", repo, "ls-files"],
                capture_output=True, text=True, check=True,
            ).stdout.splitlines()
        )
        dirty = set(
            subprocess.run(
                ["git", "-C", repo, "diff", "--name-only", "HEAD"],
                capture_output=True, text=True, check=True,
            ).stdout.splitlines()
        )
    except (OSError, subprocess.CalledProcessError) as e:
        return [f"git unavailable in {repo!r}: {e}"]
    benchlog = ""
    blpath = os.path.join(repo, "BENCHLOG.md")
    if os.path.isfile(blpath):
        with open(blpath) as fh:
            benchlog = fh.read()
    problems = []
    for f in sorted(os.listdir(repo)):
        if not _SIDE.fullmatch(f):
            continue
        excused = f in benchlog
        if f not in tracked and not excused:
            problems.append(
                f"untracked sidecar {f} with no BENCHLOG.md entry naming "
                "it — commit it or record which artifact is authoritative"
            )
        elif f in dirty and not excused:
            problems.append(
                f"sidecar {f} diverges from HEAD with no BENCHLOG.md "
                "entry naming it — commit the new reading or record why "
                "the working-tree copy supersedes the committed one"
            )
    return problems


def main() -> int:
    repo = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    problems = check(repo)
    for p in problems:
        print(f"EVIDENCE-CHAIN: {p}")
    if not problems:
        print("evidence chain clean: every sidecar tracked at HEAD or "
              "named in BENCHLOG.md")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
