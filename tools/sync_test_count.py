#!/usr/bin/env python3
"""Derive the README's test-count line from an actual `sbt test` run.

The count drifted by hand three rounds running (r15-r17 verdicts); this
makes it generated. Usage:

    sbt -batch test 2>&1 | tee /tmp/sbt_test.log
    python3 tools/sync_test_count.py /tmp/sbt_test.log

Parses sbt's final summary ("Passed: Total N, Failed 0, ..., Passed N")
and rewrites the one README line in place. Refuses to touch the README
if the run had failures or the summary is missing — a red run must
never stamp a green-looking count.
"""
import re
import sys
import pathlib

README = pathlib.Path(__file__).resolve().parent.parent / "README.md"
LINE_RE = re.compile(
    r"^(sbt compile && sbt test\s+# )\d+ tests green.*$", re.M)
# sbt aggregate summary, e.g. "[info] Passed: Total 236, Failed 0,
# Errors 0, Passed 236" (a failing run says "[error] Failed: ...")
SUMMARY_RE = re.compile(
    r"Passed: Total (\d+), Failed (\d+), Errors (\d+), Passed (\d+)")


def main(log_path: str) -> int:
    log = pathlib.Path(log_path).read_text(errors="replace")
    matches = list(SUMMARY_RE.finditer(log))
    if not matches:
        print("no sbt 'Passed: Total N' summary found — README untouched",
              file=sys.stderr)
        return 1
    # A log may carry several summaries (tee -a re-runs, multi-project
    # aggregates). The LAST one is the freshest run's aggregate; if the
    # summaries disagree we cannot tell which describes the full suite,
    # so refuse rather than stamp a possibly-partial count.
    if len({m.groups() for m in matches}) > 1:
        print(f"{len(matches)} differing 'Passed: Total' summaries in log "
              "— ambiguous (stale tee -a? partial re-run?); README untouched",
              file=sys.stderr)
        return 1
    total, failed, errors, passed = map(int, matches[-1].groups())
    if failed or errors or passed != total:
        print(f"run not green (total={total} failed={failed} "
              f"errors={errors}) — README untouched", file=sys.stderr)
        return 1
    text = README.read_text()
    new_line = rf"\g<1>{total} tests green (sbt summary, "\
               rf"synced by tools/sync_test_count.py)"
    new_text, n = LINE_RE.subn(new_line, text)
    if n != 1:
        print(f"expected exactly one test-count line in README, found {n}",
              file=sys.stderr)
        return 1
    if new_text != text:
        README.write_text(new_text)
        print(f"README test count -> {total}")
    else:
        print(f"README already says {total}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sbt_test.log"))
