// AudioWorklet: accumulate mono samples into fixed-size frames and post
// them to the renderer. At a 16 kHz context with 0.05 s steps this emits
// 800-sample Float32Array frames (reference audio-processor.js:9-25).
class FrameCaptureProcessor extends AudioWorkletProcessor {
  constructor(options) {
    super();
    this.frameSize =
      (options.processorOptions && options.processorOptions.frameSize) || 800;
    this.buffer = new Float32Array(this.frameSize);
    this.fill = 0;
  }

  process(inputs) {
    const input = inputs[0];
    if (!input || !input[0]) return true;
    const channel = input[0];
    let offset = 0;
    while (offset < channel.length) {
      const n = Math.min(this.frameSize - this.fill, channel.length - offset);
      this.buffer.set(channel.subarray(offset, offset + n), this.fill);
      this.fill += n;
      offset += n;
      if (this.fill === this.frameSize) {
        this.port.postMessage(this.buffer.slice(0));
        this.fill = 0;
      }
    }
    return true;
  }
}

registerProcessor("frame-capture", FrameCaptureProcessor);
