"""Regenerate the committed .golden.txt files after an INTENTIONAL
HTML_TEXT_RULES change.

    python tests/fixtures/html_pages/regen_goldens.py

Review the diff of every golden by hand (test_html_golden.py layer 1's
hand-asserted properties must still pass) before committing — the goldens
are a regression pin, not an oracle.
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "..", ".."))

from hbase_packet_inspector_spark.operators.web import html_to_text
from hbase_packet_inspector_spark.session import get_spark


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    spark = get_spark("golden-regen")
    spark.sparkContext.setLogLevel("ERROR")
    for p in sorted(glob.glob(os.path.join(here, "*.html"))):
        df = spark.createDataFrame([(open(p).read(),)], "body string")
        text = html_to_text(df).select("text").collect()[0].text
        g = p.replace(".html", ".golden.txt")
        open(g, "w").write(text)
        print(f"wrote {os.path.basename(g)} ({len(text)} chars)")


if __name__ == "__main__":
    main()
