"""Progress-bar line-shape tests (reference approximator.cpp:305-350)."""

import io
import re
import time


def test_format_hms():
    from dipgenie_tpu.utils.progress import format_hms

    assert format_hms(5) == "5s"
    assert format_hms(65) == "1m5s"
    assert format_hms(3600) == "1h0m0s"
    assert format_hms(3725) == "1h2m5s"


def test_progress_bar_line_shape():
    from dipgenie_tpu.utils.progress import progress_bar

    buf = io.StringIO()
    progress_bar(42, 100, time.monotonic() - 2.0, stream=buf)
    line = buf.getvalue()
    assert line.startswith("\r[")
    # 40-char bar: 16 '=', one '>', 23 spaces at 42%
    m = re.match(r"\r\[(=*)(>?)( *)\]\s+(\d+)%  42/100  \| "
                 r"([\d.]+) it/s  \| ETA (\S+)", line)
    assert m, line
    assert len(m.group(1)) + len(m.group(2)) + len(m.group(3)) == 40
    assert m.group(4) == "42"
    assert float(m.group(5)) > 0


def test_progress_throttle_fires_once_per_percent():
    from dipgenie_tpu.utils.progress import ProgressThrottle

    buf = io.StringIO()
    t = ProgressThrottle(1000, stream=buf)
    for i in range(1, 1001):
        t.update(i)
    lines = buf.getvalue().split("\r")
    # ~one line per percent (plus the initial and final), not per level
    assert 99 <= len([x for x in lines if x]) <= 103
    assert buf.getvalue().endswith("\n")
