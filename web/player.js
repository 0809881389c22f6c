/**
 * Custom audio player widget: play/pause, seek track with draggable
 * thumb, time labels, speed cycle, audio download.
 * (Equivalent affordance set to the reference's setupCustomPlayer,
 * web/main.js:113-173 — reimplemented here as a reusable module built
 * on Pointer Events instead of per-element mouse wiring.)
 */

import { formatTime } from "./utils.js";

const SPEED_LADDER = [1, 1.25, 1.5, 2, 0.75];

/**
 * Wire one player instance.  `ids` maps roles to DOM ids:
 *   { audio, play, timeNow, timeTotal, speed, download, track, fill, thumb }
 * Returns { setSource(url, downloadName), reset() }.
 */
export function attachPlayer(ids) {
    const el = {};
    for (const [role, id] of Object.entries(ids)) {
        el[role] = document.getElementById(id);
        if (!el[role]) throw new Error(`player: missing #${id}`);
    }
    let speedIdx = 0;
    let downloadName = "audio";
    let scrubbing = false;

    const renderPlayIcon = () => {
        el.play.textContent = el.audio.paused ? "▶" : "⏸";
    };
    const renderTimes = () => {
        el.timeNow.textContent = formatTime(el.audio.currentTime);
        if (Number.isFinite(el.audio.duration)) {
            el.timeTotal.textContent = formatTime(el.audio.duration);
        }
    };
    const renderTrack = () => {
        const dur = el.audio.duration;
        const pct = Number.isFinite(dur) && dur > 0
            ? Math.min(100, (el.audio.currentTime / dur) * 100) : 0;
        el.fill.style.width = `${pct}%`;
        el.thumb.style.left = `${pct}%`;
    };

    el.play.addEventListener("click", () => {
        if (el.audio.paused) el.audio.play();
        else el.audio.pause();
    });
    el.audio.addEventListener("play", renderPlayIcon);
    el.audio.addEventListener("pause", renderPlayIcon);
    el.audio.addEventListener("ended", renderPlayIcon);
    el.audio.addEventListener("loadedmetadata", () => {
        renderTimes();
        renderTrack();
    });
    el.audio.addEventListener("timeupdate", () => {
        if (scrubbing) return;
        renderTimes();
        renderTrack();
    });

    const seekToPointer = (event) => {
        const rect = el.track.getBoundingClientRect();
        const frac = Math.min(1, Math.max(0,
            (event.clientX - rect.left) / rect.width));
        if (Number.isFinite(el.audio.duration)) {
            el.audio.currentTime = frac * el.audio.duration;
        }
        renderTimes();
        renderTrack();
    };
    el.track.addEventListener("pointerdown", (event) => {
        scrubbing = true;
        el.track.setPointerCapture(event.pointerId);
        seekToPointer(event);
    });
    el.track.addEventListener("pointermove", (event) => {
        if (scrubbing) seekToPointer(event);
    });
    el.track.addEventListener("pointerup", (event) => {
        scrubbing = false;
        el.track.releasePointerCapture(event.pointerId);
        seekToPointer(event);
    });

    el.speed.addEventListener("click", () => {
        speedIdx = (speedIdx + 1) % SPEED_LADDER.length;
        el.audio.playbackRate = SPEED_LADDER[speedIdx];
        el.speed.textContent = `${SPEED_LADDER[speedIdx]}×`;
    });

    el.download.addEventListener("click", () => {
        if (!el.audio.src) return;
        const a = document.createElement("a");
        a.href = el.audio.src;
        a.download = downloadName;
        a.click();
    });

    const reset = () => {
        el.audio.pause();
        el.audio.playbackRate = 1;
        speedIdx = 0;
        el.speed.textContent = "1×";
        el.timeNow.textContent = "0:00";
        el.timeTotal.textContent = "0:00";
        el.fill.style.width = "0%";
        el.thumb.style.left = "0%";
        renderPlayIcon();
    };

    return {
        // transcript click-to-seek: jump to a segment start (seconds)
        seekTo(seconds) {
            if (!el.audio.src) return;
            const dur = el.audio.duration;
            el.audio.currentTime = Number.isFinite(dur)
                ? Math.min(Math.max(0, seconds), dur)
                : Math.max(0, seconds);
            renderTimes();
            renderTrack();
            if (el.audio.paused) el.audio.play().catch(() => {});
        },
        setSource(url, name) {
            // revoke the previous blob URL so repeated tasks don't pin
            // every selected/recorded audio buffer until the tab closes
            if (el.audio.src && el.audio.src.startsWith("blob:")) {
                URL.revokeObjectURL(el.audio.src);
            }
            el.audio.src = url;
            downloadName = name || "audio";
            reset();
        },
        clear() {
            el.audio.pause();
            if (el.audio.src && el.audio.src.startsWith("blob:")) {
                URL.revokeObjectURL(el.audio.src);
            }
            el.audio.removeAttribute("src");
            reset();
        },
        reset,
    };
}
