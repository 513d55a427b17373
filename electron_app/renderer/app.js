// Renderer: microphone -> REST streaming session -> live transcript.
//
// Flow parity with the reference client (reference electron_app/app.js):
// - AudioWorklet captures 16 kHz mono in step-sized frames (:35-39)
// - frames -> base64 float32 -> POST /session/{id}/add_chunk (:137-149)
// - a polling loop POSTs /session/{id}/process every 100 ms and renders
//   committed text solid + uncommitted dimmed (:152-176, 287-322)
// - session creation retries forever with backoff (:73-101)
// Product surface parity (:256-489): preloader with staged messages,
// error modal with quit, backend indicator (live from /health), canvas
// waveform driven by an AnalyserNode, record toggle with progress bar,
// language dropdown (wired end-to-end: the selection is sent on session
// create and forces per-session decode language), copy-to-clipboard with
// icon feedback, clear. All code original; the waveform renderer is
// self-contained (waveform.js), not the siriwave dependency.
"use strict";

const LANGUAGES = [
  ["en", "English"], ["zh", "Chinese"], ["de", "German"],
  ["es", "Spanish"], ["ru", "Russian"], ["ko", "Korean"],
  ["fr", "French"], ["ja", "Japanese"], ["pt", "Portuguese"],
  ["it", "Italian"], ["hi", "Hindi"], ["ar", "Arabic"],
];

const state = {
  config: null,
  sessionId: null,
  audioContext: null,
  workletNode: null,
  analyser: null,
  sourceNode: null,
  mediaStream: null,
  pollTimer: null,
  meterTimer: null,
  committed: [],
  running: false,
  language: "en",
  wave: null,
};

const el = (id) => document.getElementById(id);
const log = (level, msg) =>
  window.clientBridge ? window.clientBridge.log(level, msg) : console.log(msg);

function setStatus(text, cls) {
  const node = el("status");
  node.textContent = text;
  node.className = `status ${cls || ""}`;
}

// ---------------------------------------------------------------- modals --

function showError(message) {
  el("errorMessage").textContent = message;
  el("errorModal").classList.remove("hidden");
}

function preloaderOpen() {
  const pre = el("preloader");
  const msg = el("preloaderMessage");
  pre.classList.remove("preloader--done");
  msg.textContent = "Setting everything up for you…";
  // Staged messages while the server warms its compiled executables.
  state.preloadTimers = [
    setTimeout(() => {
      msg.textContent = "Warming the TPU decode executables…";
    }, 4000),
    setTimeout(() => {
      msg.textContent = "Finishing setup…";
    }, 8000),
  ];
}

function preloaderClose() {
  (state.preloadTimers || []).forEach(clearTimeout);
  el("preloader").classList.add("preloader--done");
}

// --------------------------------------------------------------- backend --

async function refreshBackendIndicator() {
  try {
    const resp = await fetch(`${state.config.backendUrl}/health`);
    if (!resp.ok) throw new Error(`HTTP ${resp.status}`);
    const data = await resp.json();
    const label = data.backend === "whisper" ? "Remote gateway" : "TPU engine";
    el("backendValue").textContent = label;
    el("backendDot").className =
      "backend-indicator__dot backend-indicator__dot--ok";
    return true;
  } catch (err) {
    el("backendValue").textContent = "offline";
    el("backendDot").className =
      "backend-indicator__dot backend-indicator__dot--bad";
    return false;
  }
}

// --------------------------------------------------------------- session --

function b64FromFloat32(f32) {
  const bytes = new Uint8Array(f32.buffer, f32.byteOffset, f32.byteLength);
  let binary = "";
  const CHUNK = 0x8000;
  for (let i = 0; i < bytes.length; i += CHUNK) {
    binary += String.fromCharCode.apply(null, bytes.subarray(i, i + CHUNK));
  }
  return btoa(binary);
}

async function createSessionWithRetry() {
  const base = state.config.backendUrl;
  // Retry forever with 2 s backoff, like the reference client.
  for (;;) {
    // One status per iteration — a specific condition (capacity) must
    // not be immediately repainted by the generic retry message.
    let status = "waiting for server...";
    try {
      const resp = await fetch(
        `${base}/session/create/?language=${encodeURIComponent(state.language)}`,
        { method: "POST" }
      );
      if (resp.ok) {
        const data = await resp.json();
        return data.session_id;
      }
      if (resp.status === 503) status = "server at capacity...";
      log("warn", `session create failed: HTTP ${resp.status}`);
    } catch (err) {
      log("warn", `session create error: ${err}`);
    }
    setStatus(status, "warn");
    refreshBackendIndicator();
    await new Promise((r) => setTimeout(r, 2000));
    if (!state.running) throw new Error("cancelled");
  }
}

async function sendChunk(frame) {
  if (!state.sessionId) return;
  const base = state.config.backendUrl;
  const audioData = encodeURIComponent(b64FromFloat32(frame));
  // One-deep send queue: chunks MUST reach the ring buffer in capture
  // order, but the browser pools connections — a stalled request could
  // let a later frame's POST land first, garbling the audio stream.
  state.sendQueue = (state.sendQueue || Promise.resolve()).then(async () => {
    try {
      await fetch(
        `${base}/session/${state.sessionId}/add_chunk?audio_data=${audioData}`,
        { method: "POST" }
      );
    } catch (err) {
      log("warn", `add_chunk failed: ${err}`);
    }
  });
}

// ------------------------------------------------------------ transcript --

function renderWords(committedWords, uncommittedWords) {
  for (const w of committedWords) state.committed.push(w.text);
  const transcript = el("transcript");
  const committedSpan = state.committed.join("");
  const uncommittedSpan = uncommittedWords.map((w) => w.text).join("");
  transcript.innerHTML = "";
  const solid = document.createElement("span");
  solid.className = "committed";
  solid.textContent = committedSpan;
  const dim = document.createElement("span");
  dim.className = "uncommitted";
  dim.textContent = uncommittedSpan;
  transcript.appendChild(solid);
  transcript.appendChild(dim);
  transcript.scrollTop = transcript.scrollHeight;
}

async function poll() {
  if (!state.sessionId || !state.running) return;
  // Never overlap polls: /process returns INCREMENTAL committed words,
  // and two in-flight requests resolving out of order would append them
  // to the transcript permanently scrambled (server tick p95 can exceed
  // the 100 ms poll interval).
  if (state.polling) return;
  state.polling = true;
  const base = state.config.backendUrl;
  try {
    const resp = await fetch(`${base}/session/${state.sessionId}/process`, {
      method: "POST",
    });
    if (resp.ok) {
      const data = await resp.json();
      renderWords(data.words || [], data.uncommited_words || []);
    }
  } catch (err) {
    log("warn", `process failed: ${err}`);
  } finally {
    state.polling = false;
  }
}

// -------------------------------------------------------------- recorder --

function meterLoop() {
  if (!state.analyser || !state.wave) return;
  const data = new Uint8Array(state.analyser.frequencyBinCount);
  state.analyser.getByteFrequencyData(data);
  let sum = 0;
  for (let i = 0; i < data.length; i++) sum += data[i];
  state.wave.setAmplitude(sum / data.length / 110);
  state.meterTimer = requestAnimationFrame(meterLoop);
}

function setRecordingUI(on) {
  el("recordBtn").classList.toggle("record-btn--on", on);
  el("progressBar").classList.toggle("progress--on", on);
  el("panelTitle").textContent = on ? "Recording…" : "Paused";
}

async function start() {
  if (state.running) return;
  state.running = true;
  // Epoch guard: a stop() (or a newer start()) during any await below
  // invalidates THIS start — without it, granting the mic permission
  // after clicking stop resumed capture, wave, and polling against a
  // null session while the UI showed Paused.
  const epoch = (state.startEpoch = (state.startEpoch || 0) + 1);
  const live = () => state.running && state.startEpoch === epoch;
  setRecordingUI(true);
  setStatus("connecting...", "warn");

  try {
    state.sessionId = await createSessionWithRetry();
    if (!live()) throw new Error("cancelled");
    setStatus("listening", "ok");
    refreshBackendIndicator();

    state.mediaStream = await navigator.mediaDevices.getUserMedia({
      audio: {
        channelCount: 1,
        sampleRate: 16000,
        echoCancellation: true,
        noiseSuppression: true,
      },
    });
    if (!live()) throw new Error("cancelled");
    state.audioContext = new AudioContext({ sampleRate: 16000 });
    await state.audioContext.audioWorklet.addModule("audio-processor.js");
    if (!live()) throw new Error("cancelled");
    state.sourceNode = state.audioContext.createMediaStreamSource(
      state.mediaStream
    );
    const frameSize = Math.round(
      state.audioContext.sampleRate * state.config.stepSizeS
    );
    state.workletNode = new AudioWorkletNode(
      state.audioContext,
      "frame-capture",
      { processorOptions: { frameSize } }
    );
    state.workletNode.port.onmessage = (ev) => sendChunk(ev.data);
    state.analyser = state.audioContext.createAnalyser();
    state.analyser.fftSize = 512;
    state.analyser.smoothingTimeConstant = 0.8;
    state.sourceNode.connect(state.analyser);
    state.sourceNode.connect(state.workletNode);

    state.wave.start();
    meterLoop();
    state.pollTimer = setInterval(poll, state.config.pollIntervalMs);
  } catch (err) {
    // Mic denied / worklet load failed / cancelled: tear down and give
    // the UI back instead of leaving the toggle stuck. A cancelled
    // start (user hit stop mid-setup) cleans up quietly — stop() again
    // releases anything created after the first stop() ran.
    const cancelled = err && err.message === "cancelled";
    if (!cancelled) {
      log("warn", `start failed: ${err}`);
      setStatus(`start failed: ${err.message || err}`, "warn");
      showError(`Could not start recording: ${err.message || err}`);
    }
    await stop();
  }
}

async function stop() {
  state.running = false;
  clearInterval(state.pollTimer);
  cancelAnimationFrame(state.meterTimer);
  if (state.wave) state.wave.stop();
  setRecordingUI(false);
  try {
    if (state.workletNode) state.workletNode.disconnect();
    if (state.sourceNode) state.sourceNode.disconnect();
    if (state.audioContext && state.audioContext.state !== "closed")
      await state.audioContext.close();
  } catch (err) {
    log("warn", `audio teardown: ${err}`);
  }
  if (state.mediaStream)
    state.mediaStream.getTracks().forEach((t) => t.stop());
  state.analyser = null;
  if (state.sessionId) {
    try {
      await fetch(
        `${state.config.backendUrl}/session/${state.sessionId}/end`,
        { method: "POST" }
      );
    } catch (err) {
      log("warn", `end session failed: ${err}`);
    }
  }
  state.sessionId = null;
  setStatus("stopped", "");
}

function toggleRecording() {
  if (state.running) stop();
  else start();
}

// ----------------------------------------------------------------- tools --

function copyTranscript() {
  const btn = el("copyBtn");
  const text = el("transcript").textContent;
  navigator.clipboard
    .writeText(text)
    .then(() => {
      // Swap to the check icon for 2 s (reference app.js:370-410).
      btn.classList.add("btn--copied");
      btn.querySelector(".icon--copy").classList.add("hidden");
      btn.querySelector(".icon--check").classList.remove("hidden");
      setTimeout(() => {
        btn.classList.remove("btn--copied");
        btn.querySelector(".icon--copy").classList.remove("hidden");
        btn.querySelector(".icon--check").classList.add("hidden");
      }, 2000);
    })
    .catch((err) => log("warn", `copy failed: ${err}`));
}

function clearTranscript() {
  state.committed = [];
  el("transcript").innerHTML = "";
  if (state.sessionId) {
    fetch(`${state.config.backendUrl}/session/${state.sessionId}/clear`, {
      method: "POST",
    }).catch((err) => log("warn", `clear failed: ${err}`));
  }
}

function initLanguageDropdown() {
  const trigger = el("langTrigger");
  const dropdown = el("langDropdown");
  const list = el("langList");
  for (const [code, name] of LANGUAGES) {
    const li = document.createElement("li");
    li.dataset.code = code;
    li.textContent = name;
    li.setAttribute("role", "option");
    if (code === state.language) li.classList.add("active");
    list.appendChild(li);
  }
  trigger.addEventListener("click", (e) => {
    e.stopPropagation();
    dropdown.classList.toggle("hidden");
  });
  list.addEventListener("click", async (e) => {
    const li = e.target.closest("li");
    if (!li) return;
    list.querySelectorAll("li").forEach((n) => n.classList.remove("active"));
    li.classList.add("active");
    state.language = li.dataset.code;
    trigger.textContent = state.language.toUpperCase();
    dropdown.classList.add("hidden");
    // A live session keeps its language; restart so the new selection
    // takes effect server-side (per-session forced decode language).
    if (state.running) {
      await stop();
      await start();
    }
  });
  document.addEventListener("click", (e) => {
    if (!el("langWrapper").contains(e.target)) {
      dropdown.classList.add("hidden");
    }
  });
}

// ------------------------------------------------------------------ init --

async function initializeApp() {
  preloaderOpen();
  // Outside Electron (browser-based development) fall back to defaults.
  state.config = window.clientBridge
    ? await window.clientBridge.getConfig()
    : { backendUrl: "http://127.0.0.1:8800", pollIntervalMs: 100,
        stepSizeS: 0.05 };
  state.wave = new window.WaveRenderer(el("waveCanvas"));
  state.wave.stop(); // idle line until recording starts
  // Wait (bounded) for the server to come up before dropping the
  // preloader; recording can still start later via retry-forever.
  for (let i = 0; i < 15; i++) {
    if (await refreshBackendIndicator()) break;
    await new Promise((r) => setTimeout(r, 1000));
  }
  preloaderClose();
}

window.addEventListener("DOMContentLoaded", () => {
  el("recordBtn").addEventListener("click", toggleRecording);
  el("copyBtn").addEventListener("click", copyTranscript);
  el("clearBtn").addEventListener("click", clearTranscript);
  el("errorDismissBtn").addEventListener("click", () =>
    el("errorModal").classList.add("hidden")
  );
  el("errorQuitBtn").addEventListener("click", () => {
    if (window.clientBridge && window.clientBridge.quitApp) {
      window.clientBridge.quitApp();
    }
  });
  initLanguageDropdown();
  initializeApp();
  window.addEventListener("beforeunload", stop);
});
