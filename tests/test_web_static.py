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


def test_player_id_maps_exist_in_html():
    """attachPlayer() receives role->id maps (web/player.js); every id in
    those maps must exist in index.html or the player throws at init."""
    html_ids = set(re.findall(r'id="([^"]+)"', read("index.html")))
    main = read("main.js")
    maps = re.findall(r'attachPlayer\(\{(.*?)\}\)', main, re.S)
    assert len(maps) >= 2, "expected preview and result players"
    for blob in maps:
        ids = set(re.findall(r':\s*"([\w-]+)"', blob))
        missing = ids - html_ids
        assert not missing, f"attachPlayer map references missing {missing}"
    # the module itself must exist and export the wiring function
    assert "export function attachPlayer" in read("player.js")


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


def test_percent_estimator_matches_reference_semantics():
    """The monotone percent estimator (reference main.js:437-460) exists
    with the reference's constants and is wired into progress rendering:
    explicit percent wins, starting >= 8, processing estimates
    min(95, 12 + elapsed/6) (40 with no elapsed), succeeded pins 100, and
    the hint only grows (no browser/JS engine in this image, so these are
    source-level checks; the server-side NN%-fallback behavior is
    exercised for real in test_serving.py)."""
    src = (WEB / "main.js").read_text(encoding="utf-8")
    assert "function computeTranscribePercent(status, progress)" in src
    assert "computeTranscribePercent(payload.status" in src  # wired in
    for marker in (
        "Math.max(state.percentHint,",          # monotone hint
        'if (status === "succeeded") return 100;',
        'status === "failed" || status === "canceled"',
        "Math.max(state.percentHint, 8);",      # starting floor
        "Math.min(95, 12 + Math.floor(elapsed / 6)) : 40;",
        "Math.max(state.percentHint, 5);",      # unknown-status floor
    ):
        assert marker in src, marker
    # the hint resets per task so a second job starts from zero
    assert "state.percentHint = 0;" in src


def test_poll_timeout_message_and_backoff():
    """Poll budget and zh-CN timeout message (reference apiService.js:6-8,
    84): 3 s initial, +1 s/poll capped at 10 s, 30 min budget."""
    src = (WEB / "apiService.js").read_text(encoding="utf-8")
    assert "const POLL_INITIAL_MS = 3000;" in src
    assert "const POLL_MAX_MS = 10000;" in src
    assert "const POLL_TIMEOUT_MS = 30 * 60 * 1000;" in src
    assert "interval = Math.min(interval + 1000, POLL_MAX_MS);" in src
    assert "转写超时，请稍后重试" in src


def test_progress_extras_surfaced():
    """Second-pass / quality / log-tail extras reach the progress UI
    (reference renderPredictionProgress, main.js:397-435)."""
    src = (WEB / "main.js").read_text(encoding="utf-8")
    assert "progress.secondPass" in src
    assert "progress.logsTail" in src
    assert "status_second_pass" in src


def test_result_view_structure_matches_reference_layout():
    """The result view carries the reference's wide two-column structure
    (reference web/index.html:240-313): a split container with the
    transcript in the main column and a STICKY sidebar holding the title,
    meta line, playback player, and the stacked action buttons; plus the
    styled quality-report panel.  Asserting the blocks here keeps the
    visual-structure gap visible to CI (VERDICT r3 #8)."""
    html = (WEB / "index.html").read_text(encoding="utf-8")
    css = (WEB / "style.css").read_text(encoding="utf-8")
    for cls in ("result-split", "result-main", "result-sidebar",
                "sidebar-sticky", "quality-panel", "transcript-panel",
                "action-stack", "result-meta"):
        assert f'class="{cls}' in html or f" {cls}" in html, cls
        assert f".{cls}" in css, f".{cls} missing from style.css"
    # sidebar is actually sticky, and the grid actually splits
    assert "position: sticky" in css
    assert "grid-template-columns" in css
    # warning state styling exists for the quality panel
    assert ".quality-panel.has-warnings" in css
    # the wide layout widens the page only on the result view
    assert "body.result-wide" in css
    assert 'classList.toggle("result-wide"' in (WEB / "main.js").read_text(
        encoding="utf-8")


def test_segment_view_speaker_coding_and_timestamp_gutter():
    """Structured transcript column (VERDICT r4 #10): per-segment rows
    with a timestamp gutter and speaker color coding, click-to-seek into
    the result player; plain-markdown <pre> stays as the no-JSON
    fallback (reference result-area rules, web/style.css:905-)."""
    html = (WEB / "index.html").read_text(encoding="utf-8")
    css = (WEB / "style.css").read_text(encoding="utf-8")
    js = (WEB / "main.js").read_text(encoding="utf-8")
    player = (WEB / "player.js").read_text(encoding="utf-8")
    assert 'id="segment-list"' in html
    for cls in ("segment-list", "segment-row", "seg-time", "seg-body",
                "speaker-chip"):
        assert f".{cls}" in css, f".{cls} missing from style.css"
    # full 8-hue palette: chip background + row border accent per hue
    for i in range(8):
        assert f".spk-{i} " in css, f"spk-{i} hue missing"
        assert f".spk-border-{i} " in css, f"spk-border-{i} missing"
    # the gutter is tabular and the rows are clickable
    assert "font-variant-numeric: tabular-nums" in css
    assert "renderSegments(" in js
    assert "seekTo(" in js and "seekTo(seconds)" in player
    # fallback contract: no segments -> markdown pre shown, list hidden
    assert "pre.hidden = false" in js and "list.hidden = true" in js
