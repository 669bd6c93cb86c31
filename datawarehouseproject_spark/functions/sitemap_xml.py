"""XML sitemap synthesis (sitemaps.org protocol) via the stdlib
ElementTree producer.

The sitemap is the crawl-discovery companion to ``robots.txt``
(``robots_txt_rules``): a 100 TB crawl learns most of its frontier
from these files. The PRODUCER here is :mod:`xml.etree.ElementTree`
— an independent serializer whose entity escaping (``&amp;`` in
query strings) the JVM-side parser must undo — and the PARSER is
zero-UDF Spark SQL in ``plans/queries_data.py`` (`xml_sitemap_scan`):
``regexp_extract_all`` over ``<url>`` blocks, per-field extraction,
entity decode, and set-based rollups, so at corpus scale the parse
runs entirely inside whole-stage codegen (the Python-narrow /
JVM-wide handoff, same shape as ``warc_response_text_stats``)."""

from __future__ import annotations

import datetime
import io
import xml.etree.ElementTree as ET


def synth_sitemap_plan(seed: int) -> dict:
    """Plan mirrored in the DuckDB oracle: ``3 + seed%5`` URLs;
    URL i is http when (seed+i)%4==0 else https, host
    ``site{(seed+i)%7}.example.com``, path ``/p/{i}?a={seed}&b={i}``
    (the ``&`` round-trips through ``&amp;``), lastmod
    ``2024-01-01 + (seed+i)%90`` days, priority ``0.{1+i%9}``."""
    n = 3 + seed % 5
    urls = []
    for i in range(n):
        scheme = "http" if (seed + i) % 4 == 0 else "https"
        host = f"site{(seed + i) % 7}.example.com"
        urls.append(
            {
                "loc": f"{scheme}://{host}/p/{i}?a={seed}&b={i}",
                "lastmod": (
                    datetime.date(2024, 1, 1)
                    + datetime.timedelta(days=(seed + i) % 90)
                ).isoformat(),
                "priority": f"0.{1 + (i % 9)}",
            }
        )
    return {"n": n, "urls": urls}


def synth_sitemap(seed: int) -> bytes:
    plan = synth_sitemap_plan(seed)
    root = ET.Element(
        "urlset", {"xmlns": "http://www.sitemaps.org/schemas/sitemap/0.9"}
    )
    for u in plan["urls"]:
        el = ET.SubElement(root, "url")
        ET.SubElement(el, "loc").text = u["loc"]
        ET.SubElement(el, "lastmod").text = u["lastmod"]
        ET.SubElement(el, "priority").text = u["priority"]
    buf = io.BytesIO()
    ET.ElementTree(root).write(buf, encoding="utf-8", xml_declaration=True)
    return buf.getvalue()
