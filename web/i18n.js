/**
 * Minimal zh/en i18n with localStorage persistence and a data-i18n DOM
 * walker (equivalent role to the reference's web/i18n.js).
 */

const STRINGS = {
    zh: {
        title: "会议录音转写 (TPU)",
        subtitle: "上传或录制会议音频，自动生成带说话人和时间戳的转写稿",
        tab_upload: "上传音频",
        tab_record: "现场录音",
        drop_hint: "拖拽音频文件到此处，或点击选择文件",
        formats_hint: "支持 wav / m4a / mp3 / flac / ogg，最大 100MB",
        language_label: "识别语言",
        lang_zh: "中文",
        lang_en: "英文",
        lang_mixed: "中英混合",
        start: "开始转写",
        record_start: "开始录音",
        record_stop: "停止录音",
        record_autostop: "录音已达 50 分钟上限，已自动停止（上传上限 100MB）",
        recording: "录音中…",
        record_stop_confirm: "确定要停止录音吗？",
        remove_file: "移除",
        remove_confirm: "确定移除当前音频吗？",
        confirm_ok: "确定",
        confirm_cancel: "取消",
        feedback: "意见反馈",
        step_upload: "上传",
        step_transcribe: "转写",
        step_process: "整理",
        status_uploading: "正在上传音频…",
        status_queued: "排队中…",
        status_processing: "转写中（通常需要几分钟）…",
        status_second_pass: "正在复核可疑片段…",
        status_done: "转写完成",
        meter_upload: "传输进度",
        meter_transcribe: "转写进度",
        task_label: "任务",
        result_title: "转写结果",
        download_md: "下载 Markdown",
        download_json: "下载 JSON",
        copy: "复制全文",
        copied: "已复制",
        quality_title: "质量报告",
        coverage: "语音覆盖率",
        quality_title: "质量报告",
        meta_segments: "段",
        new_task: "转写新文件",
        error_too_large: "文件超过 100MB 上限",
        error_empty: "文件为空",
        error_format: "不支持的文件格式",
    },
    en: {
        title: "Meeting Transcriber (TPU)",
        subtitle: "Upload or record meeting audio; get a speaker-labelled, timestamped transcript",
        tab_upload: "Upload audio",
        tab_record: "Record",
        drop_hint: "Drop an audio file here, or click to choose",
        formats_hint: "wav / m4a / mp3 / flac / ogg, up to 100MB",
        language_label: "Language",
        lang_zh: "Chinese",
        lang_en: "English",
        lang_mixed: "Mixed zh+en",
        start: "Transcribe",
        record_start: "Start recording",
        record_stop: "Stop recording",
        record_autostop: "Recording auto-stopped at the 50 min limit (100MB upload cap)",
        recording: "Recording…",
        record_stop_confirm: "Stop this recording?",
        remove_file: "Remove",
        remove_confirm: "Remove the selected audio?",
        confirm_ok: "OK",
        confirm_cancel: "Cancel",
        feedback: "Feedback",
        step_upload: "Upload",
        step_transcribe: "Transcribe",
        step_process: "Process",
        status_uploading: "Uploading audio…",
        status_queued: "Queued…",
        status_processing: "Transcribing (this usually takes a few minutes)…",
        status_second_pass: "Re-checking suspicious ranges…",
        status_done: "Done",
        meter_upload: "Upload progress",
        meter_transcribe: "Transcribe progress",
        task_label: "Task",
        result_title: "Transcript",
        download_md: "Download Markdown",
        download_json: "Download JSON",
        copy: "Copy text",
        copied: "Copied",
        quality_title: "Quality report",
        coverage: "Speech coverage",
        quality_title: "Quality report",
        meta_segments: "segments",
        new_task: "Transcribe another file",
        error_too_large: "File exceeds the 100MB limit",
        error_empty: "File is empty",
        error_format: "Unsupported file format",
    },
};

let current = localStorage.getItem("mwx_lang")
    || (navigator.language?.startsWith("zh") ? "zh" : "en");

export function t(key) {
    return STRINGS[current]?.[key] ?? STRINGS.zh[key] ?? key;
}

export function currentLanguage() {
    return current;
}

export function setLanguage(lang) {
    if (!STRINGS[lang]) return;
    current = lang;
    localStorage.setItem("mwx_lang", lang);
    applyTranslations();
}

export function applyTranslations(root = document) {
    for (const el of root.querySelectorAll("[data-i18n]")) {
        el.textContent = t(el.getAttribute("data-i18n"));
    }
    for (const el of root.querySelectorAll("[data-i18n-placeholder]")) {
        el.setAttribute("placeholder",
            t(el.getAttribute("data-i18n-placeholder")));
    }
}
