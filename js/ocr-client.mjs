/**
 * Node/browser client for the ocrs_tpu HTTP serving API, mirroring the
 * method surface of the reference's wasm-bindgen OcrEngine
 * (reference: ocrs/src/wasm_api.rs:94-214) with the engine running
 * out-of-process on a TPU host (`python -m ocrs_tpu.cli --serve`, or
 * `ocrs_tpu.serve.serve(engine)`).
 *
 * Zero dependencies — uses the global fetch (node >= 18 or any browser).
 *
 *   const ocr = new OcrClient("http://localhost:8765");
 *   const session = await ocr.loadImage(pngBytes);   // <- loadImage
 *   const lines = await session.detectText();        // <- detectText
 *   const some = await session.recognizeText([0, 2]); // lazy, extension-style
 *   const text = await session.getText();            // <- getText
 *   await session.close();
 */

export class OcrClient {
  /** @param {string} baseUrl e.g. "http://localhost:8765" */
  constructor(baseUrl) {
    this.baseUrl = baseUrl.replace(/\/$/, "");
  }

  async _post(path, body, contentType) {
    const res = await fetch(this.baseUrl + path, {
      method: "POST",
      headers: contentType ? { "Content-Type": contentType } : {},
      body,
    });
    if (!res.ok) {
      throw new Error(`${path}: HTTP ${res.status}: ${await res.text()}`);
    }
    return res;
  }

  /** Engine/device health. */
  async health() {
    const res = await fetch(this.baseUrl + "/healthz");
    return res.json();
  }

  /**
   * Upload an encoded image (PNG/JPEG bytes) and open a session
   * (wasm_api.rs loadImage role). Returns an {@link OcrClientSession}.
   */
  async loadImage(imageBytes) {
    const res = await this._post("/session", imageBytes, "application/octet-stream");
    const { id } = await res.json();
    return new OcrClientSession(this, id);
  }

  /** One-shot full pipeline -> HierText-shaped JSON (CLI --json schema). */
  async ocrJson(imageBytes) {
    const res = await this._post("/ocr", imageBytes, "application/octet-stream");
    return res.json();
  }

  /** One-shot full pipeline -> plain text. */
  async ocrText(imageBytes) {
    const res = await this._post("/ocr/text", imageBytes, "application/octet-stream");
    return res.text();
  }

  /** One-shot detection only -> line/word rects (detectText role). */
  async detectOnly(imageBytes) {
    const res = await this._post("/ocr/detect", imageBytes, "application/octet-stream");
    return res.json();
  }
}

export class OcrClientSession {
  constructor(client, id) {
    this.client = client;
    this.id = id;
  }

  /**
   * Detect words + group into lines (wasm_api.rs:130-148 detectText).
   * Returns [{index, words: [{rect: [l,t,r,b], corners: [x0,y0,...x3,y3]}]}].
   */
  async detectText() {
    const res = await this.client._post(`/session/${this.id}/detect`, null);
    return (await res.json()).lines;
  }

  /**
   * Recognize a subset of detected lines by index — the Chrome extension's
   * lazy/eager hybrid pattern (background.ts:196-211). Omit `lineIndexes`
   * to recognize everything.
   * Returns [{index, text, words: [{text, rect}]}].
   */
  async recognizeText(lineIndexes) {
    const body = JSON.stringify(lineIndexes ? { lines: lineIndexes } : {});
    const res = await this.client._post(
      `/session/${this.id}/recognize`, body, "application/json");
    return (await res.json()).lines;
  }

  /** Full pipeline on the loaded image -> plain text (getText role). */
  async getText() {
    const res = await fetch(`${this.client.baseUrl}/session/${this.id}/text`);
    if (!res.ok) {
      throw new Error(`getText: HTTP ${res.status}: ${await res.text()}`);
    }
    return res.text();
  }

  /** Drop the server-side session. */
  async close() {
    await fetch(`${this.client.baseUrl}/session/${this.id}`, { method: "DELETE" });
  }
}
