/**
 * API client for the TPU transcription server.
 *
 * Speaks the same HTTP contract as the reference's web/apiService.js:
 *   POST /api/upload        raw bytes + x-file-name / x-file-content-type
 *   POST /api/transcribe    {fileUrl, sourceFilename, language}
 *   GET  /api/transcribe?id polling with 3s -> 10s backoff, 30 min budget
 */

import { sleep } from "./utils.js";

const POLL_INITIAL_MS = 3000;
const POLL_MAX_MS = 10000;
const POLL_TIMEOUT_MS = 30 * 60 * 1000;

const BASE_URL = window.MWX_API_BASE || "";

function appKeyHeaders() {
    const key = window.MWX_APP_KEY;
    return key ? { "x-app-key": key, Authorization: `Bearer ${key}` } : {};
}

export function uploadFile(file, onProgress) {
    return new Promise((resolve, reject) => {
        const xhr = new XMLHttpRequest();
        xhr.open("POST", `${BASE_URL}/api/upload`);
        xhr.setRequestHeader("x-file-name", encodeURIComponent(file.name));
        xhr.setRequestHeader("x-file-content-type",
            file.type || "application/octet-stream");
        for (const [k, v] of Object.entries(appKeyHeaders())) {
            xhr.setRequestHeader(k, v);
        }
        xhr.upload.onprogress = (event) => {
            if (event.lengthComputable && onProgress) {
                onProgress(Math.round((event.loaded / event.total) * 100));
            }
        };
        xhr.onload = () => {
            let payload = null;
            try { payload = JSON.parse(xhr.responseText); } catch { /* noop */ }
            if (xhr.status >= 200 && xhr.status < 300 && payload?.fileUrl) {
                resolve(payload);
            } else {
                reject(new Error(payload?.error || `Upload failed (HTTP ${xhr.status})`));
            }
        };
        xhr.onerror = () => reject(new Error("Network error during upload"));
        xhr.send(file);
    });
}

export async function createTranscription(fileUrl, sourceFilename, language) {
    const resp = await fetch(`${BASE_URL}/api/transcribe`, {
        method: "POST",
        headers: { "Content-Type": "application/json", ...appKeyHeaders() },
        body: JSON.stringify({ fileUrl, sourceFilename, language }),
    });
    const payload = await resp.json().catch(() => ({}));
    if (!resp.ok) {
        throw new Error(payload?.error || `Create failed (HTTP ${resp.status})`);
    }
    return payload;
}

export async function pollTranscriptionStatus(id, onUpdate) {
    const deadline = Date.now() + POLL_TIMEOUT_MS;
    let interval = POLL_INITIAL_MS;
    let consecutiveFailures = 0;

    while (Date.now() < deadline) {
        let payload;
        try {
            const resp = await fetch(
                `${BASE_URL}/api/transcribe?id=${encodeURIComponent(id)}`,
                { headers: appKeyHeaders() });
            payload = await resp.json().catch(() => ({}));
            if (!resp.ok) {
                throw new Error(
                    payload?.error || `Poll failed (HTTP ${resp.status})`);
            }
            consecutiveFailures = 0;
        } catch (err) {
            // one dropped packet / transient 502 20 minutes into a job
            // must not orphan the whole task — tolerate a few in a row
            consecutiveFailures += 1;
            if (consecutiveFailures >= 4) throw err;
            await sleep(interval);
            continue;
        }
        if (onUpdate) onUpdate(payload);
        if (payload.status === "succeeded") return payload;
        if (payload.status === "failed" || payload.status === "canceled") {
            throw new Error(payload.error || "Transcription failed");
        }
        await sleep(interval);
        interval = Math.min(interval + 1000, POLL_MAX_MS);
    }
    // reference: apiService.js:84 (zh-CN user-facing timeout message)
    throw new Error("转写超时，请稍后重试");
}
