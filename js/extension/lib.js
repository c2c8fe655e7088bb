// Pure coordinate/batching helpers shared by the service worker
// (importScripts), the screenshot-viewer page, and the node unit tests
// (require). No chrome.* or DOM access here — everything is testable as
// plain functions.
//
// Role parity with the reference extension's coordinate + batching logic
// (ocrs-extension/src/background.ts:373-434 eager width-sorted batches,
// content.ts coordinate mapping), redesigned for the server-session
// architecture (rects are [l, t, r, b] in image px; the page overlay
// divides by `scale` = image px per CSS px).

"use strict";

const OcrsLib = {
  /** Union of a line's word rects -> one [l, t, r, b] box (image px). */
  lineUnionRect(words) {
    let l = Infinity, t = Infinity, r = -Infinity, b = -Infinity;
    for (const w of words) {
      l = Math.min(l, w.rect[0]);
      t = Math.min(t, w.rect[1]);
      r = Math.max(r, w.rect[2]);
      b = Math.max(b, w.rect[3]);
    }
    return [l, t, r, b];
  },

  /** Image-px rect -> document CSS-px box at `scale` image px per CSS px,
   * shifted by the scroll offset captured with the screenshot. */
  toDocumentBox(rect, scale, scroll = [0, 0]) {
    const [l, t, r, b] = rect;
    return {
      left: l / scale + scroll[0],
      top: t / scale + scroll[1],
      right: r / scale + scroll[0],
      bottom: b / scale + scroll[1],
    };
  },

  /** Line indexes ordered by ascending union-rect width. Batching
   * similar-width lines is the reference's ~45%-per-line batching win
   * (background.ts:383-386); ascending order surfaces short lines (headings,
   * UI chrome) first. */
  widthOrder(lines) {
    const width = (line) => {
      const [l, , r] = OcrsLib.lineUnionRect(line.words);
      return r - l;
    };
    return lines
      .map((line, i) => [width(line), line.index ?? i])
      .sort((a, b) => a[0] - b[0])
      .map(([, i]) => i);
  },

  /** Split an array into consecutive chunks of at most `size`. */
  chunk(arr, size) {
    const out = [];
    for (let i = 0; i < arr.length; i += size) out.push(arr.slice(i, i + size));
    return out;
  },

  /** The subset of `indexes` not yet requested (eager/lazy dedup), in
   * order. `requested` is a Set mutated by the caller on dispatch. */
  pendingOnly(indexes, requested) {
    return indexes.filter((i) => !requested.has(i));
  },

  /** Plan the eager pass: width-sorted batches of `size`, minus anything
   * already requested. Returns an array of index batches. */
  eagerBatches(lines, requested, size = 4) {
    const order = OcrsLib.pendingOnly(OcrsLib.widthOrder(lines), requested);
    return OcrsLib.chunk(order, size);
  },
};

// Service worker / browser page: global. Node tests: module export.
if (typeof module !== "undefined" && module.exports) {
  module.exports = OcrsLib;
} else {
  globalThis.OcrsLib = OcrsLib;
}
