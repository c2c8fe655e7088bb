// Unit tests for the extension's pure coordinate/batching helpers.
// Run with `node --test` in js/extension/ (or `make test-js` at the repo
// root, which skips gracefully when node is not installed).

"use strict";

const { test } = require("node:test");
const assert = require("node:assert/strict");
const OcrsLib = require("./lib.js");

const line = (index, rects) => ({
  index,
  words: rects.map((rect) => ({ text: "w", rect })),
});

test("lineUnionRect unions word rects", () => {
  const l = line(0, [[10, 5, 30, 20], [40, 8, 90, 18]]);
  assert.deepEqual(OcrsLib.lineUnionRect(l.words), [10, 5, 90, 20]);
});

test("toDocumentBox divides by scale and applies scroll", () => {
  const box = OcrsLib.toDocumentBox([100, 50, 300, 100], 2, [7, 11]);
  assert.deepEqual(box, { left: 57, top: 36, right: 157, bottom: 61 });
});

test("toDocumentBox defaults to no scroll", () => {
  const box = OcrsLib.toDocumentBox([10, 20, 30, 40], 1);
  assert.deepEqual(box, { left: 10, top: 20, right: 30, bottom: 40 });
});

test("widthOrder sorts ascending by union width", () => {
  const lines = [
    line(0, [[0, 0, 500, 10]]),
    line(1, [[0, 0, 50, 10]]),
    line(2, [[0, 0, 100, 10], [150, 0, 200, 10]]),
  ];
  assert.deepEqual(OcrsLib.widthOrder(lines), [1, 2, 0]);
});

test("widthOrder respects explicit line indexes", () => {
  const lines = [line(7, [[0, 0, 90, 10]]), line(3, [[0, 0, 20, 10]])];
  assert.deepEqual(OcrsLib.widthOrder(lines), [3, 7]);
});

test("chunk splits with a ragged tail", () => {
  assert.deepEqual(OcrsLib.chunk([1, 2, 3, 4, 5], 2), [[1, 2], [3, 4], [5]]);
  assert.deepEqual(OcrsLib.chunk([], 4), []);
});

test("pendingOnly filters requested indexes", () => {
  assert.deepEqual(OcrsLib.pendingOnly([1, 2, 3], new Set([2])), [1, 3]);
});

test("eagerBatches plans width-sorted batches minus requested", () => {
  const lines = [
    line(0, [[0, 0, 400, 10]]),
    line(1, [[0, 0, 100, 10]]),
    line(2, [[0, 0, 200, 10]]),
    line(3, [[0, 0, 300, 10]]),
    line(4, [[0, 0, 50, 10]]),
  ];
  // Width order: 4, 1, 2, 3, 0; line 2 already requested (hover won).
  assert.deepEqual(
    OcrsLib.eagerBatches(lines, new Set([2]), 2),
    [[4, 1], [3, 0]],
  );
});
