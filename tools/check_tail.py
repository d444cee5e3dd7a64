#!/usr/bin/env python3
"""Simulate the driver's BENCH_r{N}.json tail parse (r16 verdict #2).

The driver captures `sbt "runMain graft.Bench"` output, keeps roughly
the last 2 KB, and parses the final line as JSON. This check runs the
same extraction against a full bench log (or stdin) so the contract —
the compact one-line JSON is the literal last line and survives a 2 KB
tail cut intact — is verifiable locally before a round snapshot.

Usage: tools/check_tail.py <bench-output-file>   (or pipe on stdin)
Exit 0 and prints the parsed headline on success; exit 1 otherwise.
"""
import json
import sys

TAIL_BYTES = 2048


def main() -> int:
    data = (open(sys.argv[1], "rb").read() if len(sys.argv) > 1
            else sys.stdin.buffer.read())
    tail = data[-TAIL_BYTES:].decode("utf-8", errors="replace")
    lines = [ln.strip() for ln in tail.splitlines() if ln.strip()]
    if not lines:
        print("FAIL: empty tail", file=sys.stderr)
        return 1
    last = lines[-1]
    try:
        obj = json.loads(last)
    except json.JSONDecodeError as e:
        print(f"FAIL: last line is not clean JSON ({e}):\n{last!r}",
              file=sys.stderr)
        return 1
    for key in ("metric", "value", "unit", "queries"):
        if key not in obj:
            print(f"FAIL: parsed JSON lacks '{key}': {last[:200]}",
                  file=sys.stderr)
            return 1
    print(f"OK: metric={obj['metric']} value={obj['value']} "
          f"unit={obj['unit']} n_queries={obj.get('n_queries')} "
          f"queries_in_line={len(obj['queries'])}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
