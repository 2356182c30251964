"""The examples/demo.py tour must keep working end-to-end."""

from __future__ import annotations

import os
import sys


def test_demo_runs(spark, sf_dir, capsys):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "examples"))
    try:
        import demo

        old_argv = sys.argv
        sys.argv = ["demo.py", sf_dir]
        try:
            demo.main()
        finally:
            sys.argv = old_argv
    finally:
        sys.path.pop(0)
    out = capsys.readouterr().out
    assert "SQL (entry point A)" in out
    assert "MinHash-LSH" in out
    assert "cosine top-k" in out
