/**
 * Browser microphone recorder -> 16 kHz mono 16-bit PCM WAV.
 * (Equivalent capability to the reference's web/audioRecorder.js: mono
 * 16 kHz capture with a live level callback and a WAV-encoded File out.)
 */

export class AudioRecorder {
    constructor({ onLevel } = {}) {
        this.onLevel = onLevel;
        this.context = null;
        this.stream = null;
        this.processor = null;
        this.source = null;
        this.buffers = [];
        this.sampleRate = 16000;
        this.recording = false;
    }

    async start() {
        this.stream = await navigator.mediaDevices.getUserMedia({
            audio: { channelCount: 1, sampleRate: 16000,
                     echoCancellation: true, noiseSuppression: true },
        });
        try {
            this.context = new (window.AudioContext
                || window.webkitAudioContext)({ sampleRate: 16000 });
            this.sampleRate = this.context.sampleRate;
            this.source = this.context.createMediaStreamSource(this.stream);
            this.processor = this.context.createScriptProcessor(4096, 1, 1);
        } catch (err) {
            // release the mic if any post-permission step fails (e.g.
            // AudioContext({sampleRate}) unsupported) — otherwise the
            // mic-in-use indicator stays on until the tab closes
            this.stream.getTracks().forEach((t) => t.stop());
            this.stream = null;
            if (this.context) await this.context.close().catch(() => {});
            this.context = null;
            throw err;
        }
        this.buffers = [];
        this.recording = true;

        this.processor.onaudioprocess = (event) => {
            if (!this.recording) return;
            const data = event.inputBuffer.getChannelData(0);
            this.buffers.push(new Float32Array(data));
            if (this.onLevel) {
                let sum = 0;
                for (let i = 0; i < data.length; i += 1) sum += data[i] * data[i];
                this.onLevel(Math.sqrt(sum / data.length));
            }
        };
        this.source.connect(this.processor);
        this.processor.connect(this.context.destination);
    }

    async stop() {
        this.recording = false;
        if (this.processor) this.processor.disconnect();
        if (this.source) this.source.disconnect();
        if (this.stream) this.stream.getTracks().forEach((t) => t.stop());
        if (this.context) await this.context.close();

        const total = this.buffers.reduce((acc, b) => acc + b.length, 0);
        const merged = new Float32Array(total);
        let offset = 0;
        for (const buf of this.buffers) {
            merged.set(buf, offset);
            offset += buf.length;
        }
        return encodeWav(merged, this.sampleRate);
    }

    get durationSec() {
        const total = this.buffers.reduce((acc, b) => acc + b.length, 0);
        return total / this.sampleRate;
    }
}

export function encodeWav(samples, sampleRate) {
    const buffer = new ArrayBuffer(44 + samples.length * 2);
    const view = new DataView(buffer);
    const writeStr = (pos, str) => {
        for (let i = 0; i < str.length; i += 1) {
            view.setUint8(pos + i, str.charCodeAt(i));
        }
    };
    writeStr(0, "RIFF");
    view.setUint32(4, 36 + samples.length * 2, true);
    writeStr(8, "WAVE");
    writeStr(12, "fmt ");
    view.setUint32(16, 16, true);
    view.setUint16(20, 1, true);           // PCM
    view.setUint16(22, 1, true);           // mono
    view.setUint32(24, sampleRate, true);
    view.setUint32(28, sampleRate * 2, true);
    view.setUint16(32, 2, true);
    view.setUint16(34, 16, true);
    writeStr(36, "data");
    view.setUint32(40, samples.length * 2, true);
    for (let i = 0; i < samples.length; i += 1) {
        const s = Math.max(-1, Math.min(1, samples[i]));
        view.setInt16(44 + i * 2, s < 0 ? s * 0x8000 : s * 0x7fff, true);
    }
    return new Blob([view], { type: "audio/wav" });
}
