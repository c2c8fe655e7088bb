#!/usr/bin/env node
/**
 * Node OCR example against an ocrs_tpu serving endpoint — the counterpart of
 * the reference's js/examples/ocr-node/index.js (same modes: plain text by
 * default, --json for line/word rects, --detect-only for detection only).
 *
 * Start a server first:
 *   python -m ocrs_tpu.cli --serve 8765
 * then:
 *   node js/examples/ocr-node.mjs image.png
 *   node js/examples/ocr-node.mjs --json image.png
 *   node js/examples/ocr-node.mjs --detect-only image.png
 *   node js/examples/ocr-node.mjs --lazy image.png   # session + per-line recognition
 */
import { readFile } from "node:fs/promises";
import process from "node:process";

import { OcrClient } from "../ocr-client.mjs";

function parseArgs(argv) {
  const opts = { url: "http://localhost:8765", mode: "text", image: null };
  for (let i = 0; i < argv.length; i++) {
    const a = argv[i];
    if (a === "--json" || a === "-j") opts.mode = "json";
    else if (a === "--detect-only" || a === "-d") opts.mode = "detect";
    else if (a === "--lazy") opts.mode = "lazy";
    else if (a === "--url") opts.url = argv[++i];
    else opts.image = a;
  }
  if (!opts.image) {
    console.error(
      "usage: ocr-node.mjs [--json|--detect-only|--lazy] [--url URL] <image>");
    process.exit(2);
  }
  return opts;
}

const opts = parseArgs(process.argv.slice(2));
const image = await readFile(opts.image);
const ocr = new OcrClient(opts.url);

if (opts.mode === "detect") {
  console.log(JSON.stringify(await ocr.detectOnly(image), null, 2));
} else if (opts.mode === "json") {
  console.log(JSON.stringify(await ocr.ocrJson(image), null, 2));
} else if (opts.mode === "lazy") {
  // Session lifecycle: detect everything, then recognize lines one at a
  // time on demand (the Chrome extension's pattern).
  const session = await ocr.loadImage(image);
  const lines = await session.detectText();
  console.error(`detected ${lines.length} lines`);
  for (const line of lines) {
    const [rec] = await session.recognizeText([line.index]);
    console.log(rec.text ?? "");
  }
  await session.close();
} else {
  process.stdout.write(await ocr.ocrText(image));
}
