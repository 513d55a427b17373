// Renderer: microphone -> REST streaming session -> live transcript.
//
// Flow parity with the reference client (electron_app/app.js):
// - AudioWorklet captures 16 kHz mono in step-sized frames (:35-39)
// - frames -> base64 float32 -> POST /session/{id}/add_chunk (:137-149)
// - a polling loop POSTs /session/{id}/process every 100 ms and renders
//   committed text solid + uncommitted dimmed (:152-176, 287-322)
// - session creation retries forever with backoff (:73-101)
"use strict";

const state = {
  config: null,
  sessionId: null,
  audioContext: null,
  workletNode: null,
  mediaStream: null,
  pollTimer: null,
  committed: [],
  running: false,
};

const el = (id) => document.getElementById(id);
const log = (level, msg) =>
  window.clientBridge ? window.clientBridge.log(level, msg) : console.log(msg);

function setStatus(text, cls) {
  const node = el("status");
  node.textContent = text;
  node.className = `status ${cls || ""}`;
}

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
    try {
      const resp = await fetch(`${base}/session/create/`, { method: "POST" });
      if (resp.ok) {
        const data = await resp.json();
        return data.session_id;
      }
      log("warn", `session create failed: HTTP ${resp.status}`);
    } catch (err) {
      log("warn", `session create error: ${err}`);
    }
    setStatus("waiting for server...", "warn");
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

function renderWords(committedWords, uncommittedWords) {
  for (const w of committedWords) state.committed.push(w.text);
  const transcript = el("transcript");
  const committedSpan = state.committed.join("");
  const uncommittedSpan = uncommittedWords.map((w) => w.text).join("");
  transcript.innerHTML = "";
  const solid = document.createElement("span");
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

async function start() {
  if (state.running) return;
  state.running = true;
  el("startBtn").disabled = true;
  // Stop is live immediately so the retry-forever session create (and
  // any later failure) can always be cancelled from the UI.
  el("stopBtn").disabled = false;
  setStatus("connecting...", "warn");

  try {
    state.config = await window.clientBridge.getConfig();
    state.sessionId = await createSessionWithRetry();
    setStatus("listening", "ok");

    state.mediaStream = await navigator.mediaDevices.getUserMedia({
      audio: {
        channelCount: 1,
        sampleRate: 16000,
        echoCancellation: true,
        noiseSuppression: true,
      },
    });
    state.audioContext = new AudioContext({ sampleRate: 16000 });
    await state.audioContext.audioWorklet.addModule("audio-processor.js");
    const source = state.audioContext.createMediaStreamSource(
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
    source.connect(state.workletNode);

    state.pollTimer = setInterval(poll, state.config.pollIntervalMs);
  } catch (err) {
    // Mic denied / worklet load failed / cancelled: tear down and give
    // the UI back instead of leaving both buttons disabled forever.
    log("warn", `start failed: ${err}`);
    setStatus(`start failed: ${err.message || err}`, "warn");
    await stop();
  }
}

async function stop() {
  state.running = false;
  clearInterval(state.pollTimer);
  try {
    if (state.workletNode) state.workletNode.disconnect();
    if (state.audioContext && state.audioContext.state !== "closed")
      await state.audioContext.close();
  } catch (err) {
    log("warn", `audio teardown: ${err}`);
  }
  if (state.mediaStream)
    state.mediaStream.getTracks().forEach((t) => t.stop());
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
  el("startBtn").disabled = false;
  el("stopBtn").disabled = true;
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

window.addEventListener("DOMContentLoaded", () => {
  el("startBtn").addEventListener("click", start);
  el("stopBtn").addEventListener("click", stop);
  el("clearBtn").addEventListener("click", clearTranscript);
  window.addEventListener("beforeunload", stop);
});
