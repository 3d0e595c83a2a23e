"""Value extraction from matched elements (reference P5,
parsers/base.py:176-225) + the link/media harvest used by the HTTP fetcher.
"""

from __future__ import annotations

from urllib.parse import urljoin

from .dom import Node


def extract_value(el, attribute: str | None, extract_type: str,
                  is_xpath: bool, base_url: str | None) -> str | None:
    """Mirror of _extract_value_from_element (parsers/base.py:176-225):
    attribute > html > text; href absolutized; bs4 text = get_text(strip=True)
    (no separator), lxml text = text_content().strip()."""
    if not isinstance(el, Node):
        return None  # attribute strings were already filtered out upstream
    try:
        if attribute:
            attr_val = el.get(attribute)
            if attr_val:
                if attribute == "href" and base_url:
                    attr_val = urljoin(base_url, attr_val)
                return str(attr_val)
            return None
        if extract_type == "html":
            return el.outer_html()
        if is_xpath:
            return el.text_content().strip()
        return el.get_text(strip=True)
    except Exception:
        return None


def extract_links_and_media(root: Node, base_url: str) -> tuple[str, list[str], list[str]]:
    """(plain text, outlinks, media refs) for the crawl fetcher: a[href]
    absolutized + img[src] / og:image, body text with ' ' separator."""
    links: list[str] = []
    media: list[str] = []
    for el in root.iter_elements():
        if el.tag == "a":
            href = el.get("href")
            if href and not href.startswith(("#", "javascript:", "mailto:")):
                links.append(urljoin(base_url, href))
        elif el.tag == "img":
            src = el.get("src")
            if src:
                media.append(urljoin(base_url, src))
        elif el.tag == "meta" and el.get("property") == "og:image":
            content = el.get("content")
            if content:
                media.append(urljoin(base_url, content))
    body = root.find("body") or root
    text = " ".join(body.get_text(separator=" ", strip=True).split())
    return text, links, media
