"""Static consistency checks for the browser frontend.

No browser exists in this environment, so the classic "renders blank
because one getElementById typo threw during init" class of bug is caught
statically instead: every DOM id the controller scripts touch must exist
in index.html, every data-i18n key must exist in both language tables, and
every API route the client calls must be handled by the server.
(Reference frontend counterpart: web/main.js, web/i18n.js,
web/apiService.js.)
"""

import re
from pathlib import Path

WEB = Path(__file__).resolve().parent.parent / "web"


def read(name: str) -> str:
    return (WEB / name).read_text(encoding="utf-8")


def test_dom_ids_referenced_by_js_exist_in_html():
    html = read("index.html")
    html_ids = set(re.findall(r'id="([^"]+)"', html))
    for script in ("main.js", "i18n.js", "utils.js", "apiService.js"):
        js = read(script)
        used = set(re.findall(r'\$\("([^"]+)"\)', js))
        used |= set(re.findall(r'getElementById\("([^"]+)"\)', js))
        used.discard("id")  # the helper definition itself
        missing = used - html_ids
        assert not missing, f"{script} references missing ids: {missing}"


def test_js_class_selectors_exist_in_html():
    html = read("index.html")
    js = read("main.js")
    classes_in_html = set()
    for blob in re.findall(r'class="([^"]+)"', html):
        classes_in_html.update(blob.split())
    used = set(re.findall(r'querySelectorAll\("\.([\w-]+)"\)', js))
    missing = used - classes_in_html
    assert not missing, f"main.js selects missing classes: {missing}"


def test_i18n_keys_cover_dom_and_js():
    html = read("index.html")
    i18n = read("i18n.js")
    # language tables: `zh: { key: "...", ... }` / `en: {...}`
    blocks = dict(re.findall(r'\n    (zh|en): \{(.*?)\n    \}', i18n, re.S))
    assert set(blocks) == {"zh", "en"}, "could not locate language tables"
    zh_keys = set(re.findall(r'^\s*(\w+):\s*"', blocks["zh"], re.M))
    en_keys = set(re.findall(r'^\s*(\w+):\s*"', blocks["en"], re.M))
    assert zh_keys == en_keys, (
        f"zh/en tables diverge: {zh_keys ^ en_keys}")

    dom_keys = set(re.findall(r'data-i18n(?:-placeholder)?="([^"]+)"', html))
    missing = dom_keys - zh_keys
    assert not missing, f"index.html uses undefined i18n keys: {missing}"

    js_keys = set(re.findall(r'\bt\("([^"]+)"', read("main.js")))
    missing = js_keys - zh_keys
    assert not missing, f"main.js uses undefined i18n keys: {missing}"


def test_client_api_routes_are_served():
    api = read("apiService.js")
    routes = set(re.findall(r'\$\{BASE_URL\}(/api/[\w/]+)', api))
    assert routes, "client should call at least one /api route"
    server_src = (Path(__file__).resolve().parent.parent
                  / "manual_whisper_tpu/serving/server.py"
                  ).read_text(encoding="utf-8")
    for route in routes:
        assert route in server_src, f"server does not handle {route}"


def test_index_references_only_existing_assets():
    html = read("index.html")
    for src in re.findall(r'(?:src|href)="([\w./-]+)"', html):
        if src.startswith(("http", "data:", "#")):
            continue
        assert (WEB / src).exists(), f"index.html references missing {src}"
