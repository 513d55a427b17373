// Self-contained canvas waveform renderer (no dependencies).
//
// Plays the role of the siriwave library in the reference client
// (reference electron_app/app.js:256-285: ios9-style multi-curve wave
// driven by an AnalyserNode average). This is an original implementation:
// a stack of traveling sine curves, each with its own spatial frequency,
// speed, attenuation and color, multiplied by a squared-cosine envelope so
// the wave pinches to zero at both edges. Amplitude is set externally from
// microphone levels and eased toward the target for a smooth response.
"use strict";

class WaveRenderer {
  constructor(canvas) {
    this.canvas = canvas;
    this.ctx = canvas.getContext("2d");
    this.phase = 0;
    this.amplitude = 0; // current (eased)
    this.target = 0; // requested
    this.running = false;
    this._frame = null;
    // Each curve: spatial frequency (cycles across the width), phase
    // speed, vertical attenuation, line width, color (alpha encodes the
    // reference's per-curve opacity stack).
    this.curves = [
      { freq: 1.4, speed: 0.9, att: 0.25, width: 1, color: "rgba(94,234,212,0.25)" },
      { freq: 2.2, speed: 1.3, att: -0.45, width: 1, color: "rgba(125,211,252,0.35)" },
      { freq: 3.1, speed: 1.0, att: 0.7, width: 1.2, color: "rgba(165,180,252,0.5)" },
      { freq: 1.8, speed: 1.6, att: -0.9, width: 1.4, color: "rgba(125,211,252,0.8)" },
      { freq: 2.6, speed: 1.15, att: 1.0, width: 1.8, color: "rgba(94,234,212,1)" },
    ];
    this._resize = this._resize.bind(this);
    window.addEventListener("resize", this._resize);
    this._resize();
  }

  _resize() {
    const dpr = window.devicePixelRatio || 1;
    const rect = this.canvas.parentElement.getBoundingClientRect();
    this.canvas.width = Math.max(1, rect.width * dpr);
    this.canvas.height = Math.max(1, rect.height * dpr);
    this.ctx.setTransform(dpr, 0, 0, dpr, 0, 0);
    this.w = rect.width;
    this.h = rect.height;
  }

  setAmplitude(a) {
    this.target = Math.max(0, Math.min(1, a));
  }

  start() {
    if (this.running) return;
    this.running = true;
    const tick = () => {
      if (!this.running) return;
      this._draw();
      this._frame = requestAnimationFrame(tick);
    };
    tick();
  }

  stop() {
    this.running = false;
    if (this._frame) cancelAnimationFrame(this._frame);
    this.target = 0;
    this.amplitude = 0;
    this._drawIdleLine();
  }

  _envelope(t) {
    // t in [0, 1]; squared cosine window pinches the wave at the edges.
    const c = Math.cos(Math.PI * (t - 0.5));
    return c * c * c * c;
  }

  _draw() {
    const { ctx, w, h } = this;
    // Ease amplitude toward the target (attack faster than release).
    const k = this.target > this.amplitude ? 0.3 : 0.08;
    this.amplitude += (this.target - this.amplitude) * k;
    this.phase += 0.045 + this.amplitude * 0.05;

    ctx.clearRect(0, 0, w, h);
    const mid = h / 2;
    const maxRise = h * 0.42;
    for (const c of this.curves) {
      ctx.beginPath();
      ctx.lineWidth = c.width;
      ctx.strokeStyle = c.color;
      const steps = Math.max(64, Math.floor(w / 3));
      for (let i = 0; i <= steps; i++) {
        const t = i / steps;
        const x = t * w;
        const y =
          mid +
          Math.sin(2 * Math.PI * (t * c.freq) + this.phase * c.speed) *
            this._envelope(t) *
            this.amplitude *
            c.att *
            maxRise;
        if (i === 0) ctx.moveTo(x, y);
        else ctx.lineTo(x, y);
      }
      ctx.stroke();
    }
  }

  _drawIdleLine() {
    const { ctx, w, h } = this;
    ctx.clearRect(0, 0, w, h);
    ctx.beginPath();
    ctx.lineWidth = 1;
    ctx.strokeStyle = "rgba(125,211,252,0.25)";
    ctx.moveTo(0, h / 2);
    ctx.lineTo(w, h / 2);
    ctx.stroke();
  }
}

// Exposed for app.js (renderer scripts share the window scope).
window.WaveRenderer = WaveRenderer;
