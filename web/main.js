/**
 * App controller: upload/record -> transcribe -> poll -> render result.
 * Equivalent role to the reference's web/main.js state machine, written
 * against the same server API (apiService.js).
 */

import { createTranscription, pollTranscriptionStatus, uploadFile }
    from "./apiService.js";
import { AudioRecorder } from "./audioRecorder.js";
import { applyTranslations, currentLanguage, setLanguage, t } from "./i18n.js";
import { attachPlayer } from "./player.js";
import { clampPercent, extractFileBaseName, formatBytes, formatTime }
    from "./utils.js";

const MAX_UPLOAD_BYTES = 100 * 1024 * 1024;
const ALLOWED_EXTENSIONS = new Set([
    "wav", "m4a", "mp3", "flac", "ogg", "aac", "wma", "webm", "mp4",
]);

const $ = (id) => document.getElementById(id);

const state = {
    file: null,
    recorder: null,
    recordTimer: null,
    polling: false,
    lastPercent: 0,
    percentHint: 0,
    result: null,
    baseName: "transcript",
    confirmAction: null,
    elapsedTimer: null,
    taskStart: 0,
};

// custom players (preview + result playback), wired on DOM ready
const players = {};

// ---------------------------------------------------------------------------
// wiring
// ---------------------------------------------------------------------------

document.addEventListener("DOMContentLoaded", () => {
    applyTranslations();
    $("lang-toggle").addEventListener("click", () => {
        setLanguage(currentLanguage() === "zh" ? "en" : "zh");
        renderFileInfo();
    });

    for (const tab of document.querySelectorAll(".tab")) {
        tab.addEventListener("click", () => switchTab(tab.dataset.tab));
    }

    const dropZone = $("drop-zone");
    dropZone.addEventListener("click", () => $("file-input").click());
    dropZone.addEventListener("dragover", (e) => {
        e.preventDefault();
        dropZone.classList.add("dragging");
    });
    dropZone.addEventListener("dragleave",
        () => dropZone.classList.remove("dragging"));
    dropZone.addEventListener("drop", (e) => {
        e.preventDefault();
        dropZone.classList.remove("dragging");
        if (e.dataTransfer.files.length) selectFile(e.dataTransfer.files[0]);
    });
    $("file-input").addEventListener("change", (e) => {
        if (e.target.files.length) selectFile(e.target.files[0]);
    });

    $("record-btn").addEventListener("click", onRecordButton);
    $("start-btn").addEventListener("click", startTranscriptionTask);
    $("copy-btn").addEventListener("click", copyTranscript);
    $("download-md").addEventListener("click", () => downloadResult("md"));
    $("download-json").addEventListener("click", () => downloadResult("json"));
    $("new-task-btn").addEventListener("click", resetToInput);

    // custom players: play/pause, draggable seek, time labels, speed
    // cycle (1 -> 1.25 -> 1.5 -> 2 -> 0.75), audio download — the same
    // affordance set as the reference's setupCustomPlayer, for both the
    // input preview and the result-side playback
    players.preview = attachPlayer({
        audio: "audio-preview", play: "pv-play", timeNow: "pv-now",
        timeTotal: "pv-total", speed: "pv-speed", download: "pv-download",
        track: "pv-track", fill: "pv-fill", thumb: "pv-thumb",
    });
    players.result = attachPlayer({
        audio: "result-audio", play: "rp-play", timeNow: "rp-now",
        timeTotal: "rp-total", speed: "rp-speed", download: "rp-download",
        track: "rp-track", fill: "rp-fill", thumb: "rp-thumb",
    });
    $("remove-file-btn").addEventListener("click", () =>
        openConfirm(t("remove_confirm"), removeSelectedFile));

    $("confirm-cancel").addEventListener("click", closeConfirm);
    $("confirm-ok").addEventListener("click", () => {
        const action = state.confirmAction;
        closeConfirm();
        if (action) action();
    });
    $("confirm-modal").addEventListener("click", (e) => {
        if (e.target === $("confirm-modal")) closeConfirm();
    });
});

// ---------------------------------------------------------------------------
// confirm modal
// ---------------------------------------------------------------------------

function openConfirm(text, action) {
    state.confirmAction = action;
    $("confirm-text").textContent = text;
    $("confirm-modal").hidden = false;
}

function closeConfirm() {
    state.confirmAction = null;
    $("confirm-modal").hidden = true;
}

function removeSelectedFile() {
    state.file = null;
    players.preview.clear();   // stop playback + free the blob URL —
                               // hiding the row alone leaves invisible
                               // audio playing with no way to stop it
    $("preview-row").hidden = true;
    $("start-btn").disabled = true;
    renderFileInfo();
}

function onRecordButton() {
    // stopping mid-recording loses nothing but still deserves a confirm,
    // matching the reference's stop/remove confirmation flow
    if (state.recorder) {
        openConfirm(t("record_stop_confirm"), toggleRecording);
    } else {
        toggleRecording();
    }
}

function switchTab(name) {
    for (const tab of document.querySelectorAll(".tab")) {
        tab.classList.toggle("active", tab.dataset.tab === name);
    }
    $("panel-upload").hidden = name !== "upload";
    $("panel-record").hidden = name !== "record";
}

// ---------------------------------------------------------------------------
// file selection & validation
// ---------------------------------------------------------------------------

function validateFile(file) {
    if (!file || file.size === 0) return t("error_empty");
    if (file.size > MAX_UPLOAD_BYTES) return t("error_too_large");
    const ext = (file.name.split(".").pop() || "").toLowerCase();
    if (!ALLOWED_EXTENSIONS.has(ext)) return t("error_format");
    return null;
}

function selectFile(file) {
    const error = validateFile(file);
    if (error) {
        showError(error);
        return;
    }
    hideError();
    state.file = file;
    state.baseName = extractFileBaseName(file.name);
    renderFileInfo();
    players.preview.setSource(URL.createObjectURL(file), file.name);
    $("preview-row").hidden = false;
    $("start-btn").disabled = false;
}

function renderFileInfo() {
    const info = $("file-info");
    if (state.file) {
        info.textContent = `${state.file.name} · ${formatBytes(state.file.size)}`;
        info.hidden = false;
    } else {
        info.hidden = true;
    }
}

// ---------------------------------------------------------------------------
// recording
// ---------------------------------------------------------------------------

async function toggleRecording() {
    const btn = $("record-btn");
    if (state.recorder) {
        // detach state BEFORE awaiting stop(): the level timer (and a
        // second click) must not re-enter and double-stop the recorder
        const recorder = state.recorder;
        state.recorder = null;
        clearInterval(state.recordTimer);
        const blob = await recorder.stop();
        btn.textContent = t("record_start");
        btn.classList.remove("recording");
        const stamp = new Date().toISOString().slice(0, 16)
            .replace("T", "_").replaceAll(":", "-");
        const file = new File([blob], `recording_${stamp}.wav`,
            { type: "audio/wav" });
        selectFile(file);
        return;
    }
    if (state.recorderStarting) return;   // click while permission prompt
    state.recorderStarting = true;        // is up must not start a 2nd mic
    try {
        const recorder = new AudioRecorder({
            onLevel: (rms) => {
                $("level-bar").style.width =
                    `${Math.min(100, Math.round(rms * 400))}%`;
            },
        });
        await recorder.start();
        state.recorder = recorder;
        btn.textContent = t("record_stop");
        btn.classList.add("recording");
        state.recordTimer = setInterval(() => {
            $("record-time").textContent = formatTime(recorder.durationSec);
            // a 16 kHz/16-bit WAV passes 100 MB (the upload cap) at
            // ~52 min; auto-stop before the recording becomes
            // unuploadable and the audio is lost
            if (recorder.durationSec >= 50 * 60
                    && state.recorder === recorder) {
                toggleRecording();   // detaches state.recorder first —
                                     // later ticks can't re-enter
                showError(t("record_autostop"));
            }
        }, 250);
    } catch (err) {
        showError(`${err.message || err}`);
    } finally {
        state.recorderStarting = false;
    }
}

// ---------------------------------------------------------------------------
// transcription task
// ---------------------------------------------------------------------------

async function startTranscriptionTask() {
    const file = state.file;
    const error = validateFile(file);
    if (error) {
        showError(error);
        return;
    }
    hideError();
    showSection("progress");
    setStep("upload");
    setStatus(t("status_uploading"));
    state.lastPercent = 0;
    state.percentHint = 0;
    setMeter("upload-meter", 0);
    setMeter("transcribe-meter", 0);
    $("task-line").textContent = "";
    startElapsedTicker();

    try {
        const { fileUrl } = await uploadFile(file, (pct) => {
            setPercent(pct * 0.2);
            setMeter("upload-meter", pct);
        });
        setMeter("upload-meter", 100);
        setStep("transcribe");
        setStatus(t("status_queued"));
        const created = await createTranscription(
            fileUrl, file.name, $("language-select").value);
        $("task-line").textContent = `${t("task_label")}: ${created.id}`;

        const final = await pollTranscriptionStatus(created.id,
            renderPredictionProgress);
        setStep("process");
        finishProcess(final);
    } catch (err) {
        stopElapsedTicker();
        showSection("input");
        showError(err.message || String(err));
    }
}

function startElapsedTicker() {
    state.taskStart = Date.now();
    $("elapsed-time").textContent = "";
    stopElapsedTicker();
    state.elapsedTimer = setInterval(() => {
        const sec = Math.floor((Date.now() - state.taskStart) / 1000);
        $("elapsed-time").textContent = `(${formatTime(sec)})`;
    }, 1000);
}

function stopElapsedTicker() {
    if (state.elapsedTimer) {
        clearInterval(state.elapsedTimer);
        state.elapsedTimer = null;
    }
}

function setMeter(id, pct) {
    $(id).style.width = `${clampPercent(pct)}%`;
    $(`${id}-num`).textContent = `${Math.round(clampPercent(pct))}%`;
}

function renderPredictionProgress(payload) {
    const progress = payload.progress || {};
    const isSecondPass = Boolean(progress.secondPass
        && payload.status === "processing");
    setStatus(isSecondPass ? t("status_second_pass")
        : t("status_processing"));
    // server percent mapped into the 20-95% band (upload owns 0-20);
    // the estimator keeps the bar moving when no explicit percent arrives
    const computed = computeTranscribePercent(payload.status || "starting",
        progress);
    setPercent(20 + computed * 0.75);
    setMeter("transcribe-meter", computed);
    const tail = progress.logsTail || [];
    $("log-tail").textContent = tail.join("\n");
}

// Monotone percent estimator (reference: computeTranscribePercent,
// main.js:437-460): an explicit in-range progress.percent wins; otherwise
// estimate from status + elapsed time.  state.percentHint only ever grows,
// so the bar never regresses even when polls carry no "NN%" logs.
function computeTranscribePercent(status, progress) {
    const explicit = Number(progress.percent);
    if (Number.isFinite(explicit) && explicit >= 0 && explicit <= 100) {
        state.percentHint = Math.max(state.percentHint,
            Math.round(explicit));
        return state.percentHint;
    }
    if (status === "succeeded") return 100;
    if (status === "failed" || status === "canceled") {
        return state.percentHint;
    }
    if (status === "starting") {
        state.percentHint = Math.max(state.percentHint, 8);
        return state.percentHint;
    }
    if (status === "processing") {
        const elapsed = Number(progress.elapsedSec);
        const estimated = Number.isFinite(elapsed)
            ? Math.min(95, 12 + Math.floor(elapsed / 6)) : 40;
        state.percentHint = Math.max(state.percentHint, estimated);
        return state.percentHint;
    }
    state.percentHint = Math.max(state.percentHint, 5);
    return state.percentHint;
}

function setPercent(pct) {
    state.lastPercent = Math.max(state.lastPercent, clampPercent(pct));
    $("progress-bar").style.width = `${state.lastPercent}%`;
    $("progress-num").textContent = `${Math.round(state.lastPercent)}%`;
}

function setStatus(text) {
    $("status-line").textContent = text;
}

function setStep(step) {
    for (const el of document.querySelectorAll(".step")) {
        el.classList.toggle("active", el.dataset.step === step);
    }
}

// ---------------------------------------------------------------------------
// results
// ---------------------------------------------------------------------------

function finishProcess(final) {
    stopElapsedTicker();
    setPercent(100);
    setMeter("transcribe-meter", 100);
    setStatus(t("status_done"));
    state.result = final.output || {};
    showSection("result");

    // result-side playback of the source audio next to the transcript
    if (state.file) {
        players.result.setSource(URL.createObjectURL(state.file),
            state.file.name);
        $("result-player-row").hidden = false;
    } else {
        $("result-player-row").hidden = true;
    }

    // sidebar meta line: source name, segment count, detected language
    const segs = final.output?.json?.segments || final.output?.segments || [];
    renderSegments(segs, state.result.markdown || "");
    const lang = final.output?.json?.language || final.output?.language || "";
    const metaParts = [];
    if (state.file?.name) metaParts.push(state.file.name);
    if (segs.length) metaParts.push(`${segs.length} ${t("meta_segments")}`);
    if (lang) metaParts.push(lang);
    $("result-meta").textContent = metaParts.join(" · ");

    const quality = final.output?.json?.quality_report;
    const qualityBox = $("quality-box");
    if (quality) {
        const coverage = Math.round((quality.coverage_ratio || 0) * 1000) / 10;
        const lines = [`${t("coverage")}: ${coverage}%`];
        for (const warning of quality.warnings || []) lines.push(`⚠️ ${warning}`);
        $("quality-lines").textContent = lines.join("\n");
        qualityBox.hidden = false;
        qualityBox.classList.toggle("has-warnings",
            (quality.warnings || []).length > 0);
    } else {
        qualityBox.hidden = true;
    }
}

// structured transcript: one row per segment with a tabular timestamp
// gutter and (when diarization ran) a color-coded speaker chip; clicking
// a row seeks the result player to the segment start.  Falls back to the
// plain markdown <pre> when the result carries no segment JSON.
const SPEAKER_HUES = 8; // .spk-0 … .spk-7 in style.css, cycled beyond

function fmtStamp(sec) {
    const s = Math.max(0, Number(sec) || 0);
    const m = Math.floor(s / 60);
    return `${m}:${(s - m * 60).toFixed(1).padStart(4, "0")}`;
}

function renderSegments(segs, markdown) {
    const list = $("segment-list");
    const pre = $("transcript-view");
    list.textContent = "";
    if (!segs.length) {
        pre.textContent = markdown;
        pre.hidden = false;
        list.hidden = true;
        return;
    }
    const hue = new Map(); // speaker label -> stable palette index
    for (const seg of segs) {
        const row = document.createElement("div");
        row.className = "segment-row";
        const time = document.createElement("span");
        time.className = "seg-time";
        time.textContent = `${fmtStamp(seg.start)}–${fmtStamp(seg.end)}`;
        row.appendChild(time);
        const body = document.createElement("div");
        body.className = "seg-body";
        if (seg.speaker) {
            if (!hue.has(seg.speaker)) hue.set(seg.speaker, hue.size);
            const idx = hue.get(seg.speaker) % SPEAKER_HUES;
            const chip = document.createElement("span");
            chip.className = `speaker-chip spk-${idx}`;
            chip.textContent = seg.speaker;
            body.appendChild(chip);
            row.classList.add(`spk-border-${idx}`);
        }
        body.appendChild(
            document.createTextNode((seg.text || "").trim()));
        row.appendChild(body);
        row.addEventListener("click",
            () => players.result.seekTo(seg.start));
        list.appendChild(row);
    }
    list.hidden = false;
    pre.hidden = true;
}

function downloadResult(kind) {
    if (!state.result) return;
    const isMd = kind === "md";
    const content = isMd ? (state.result.markdown || "")
        : JSON.stringify(state.result.json || {}, null, 2);
    const blob = new Blob([content],
        { type: isMd ? "text/markdown" : "application/json" });
    const a = document.createElement("a");
    a.href = URL.createObjectURL(blob);
    a.download = `${state.baseName}_transcript.${isMd ? "md" : "json"}`;
    a.click();
    URL.revokeObjectURL(a.href);
}

async function copyTranscript() {
    if (!state.result?.markdown) return;
    try {
        if (navigator.clipboard?.writeText) {
            await navigator.clipboard.writeText(state.result.markdown);
        } else {
            // plain-http deployments (TPU host over http://host:8000):
            // navigator.clipboard exists only in secure contexts
            const ta = document.createElement("textarea");
            ta.value = state.result.markdown;
            ta.style.position = "fixed";
            ta.style.opacity = "0";
            document.body.appendChild(ta);
            ta.select();
            document.execCommand("copy");
            ta.remove();
        }
    } catch (err) {
        showError(`${err.message || err}`);
        return;
    }
    const btn = $("copy-btn");
    const original = btn.textContent;
    btn.textContent = t("copied");
    setTimeout(() => { btn.textContent = original; }, 1200);
}

function resetToInput() {
    state.file = null;
    state.result = null;
    stopElapsedTicker();
    players.preview.reset();
    players.result.reset();
    $("start-btn").disabled = true;
    $("preview-row").hidden = true;
    $("result-player-row").hidden = true;
    renderSegments([], "");   // clear the structured transcript view
    renderFileInfo();
    showSection("input");
}

// ---------------------------------------------------------------------------
// sections & errors
// ---------------------------------------------------------------------------

function showSection(name) {
    $("section-input").hidden = name !== "input";
    $("section-progress").hidden = name !== "progress";
    $("section-result").hidden = name !== "result";
    // the result view spreads transcript + sidebar across the wide layout
    document.body.classList.toggle("result-wide", name === "result");
}

function showError(message) {
    const box = $("error-box");
    box.textContent = message;
    box.hidden = false;
}

function hideError() {
    $("error-box").hidden = true;
}
