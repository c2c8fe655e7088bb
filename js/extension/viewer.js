// Screenshot-viewer page logic: ask the worker for this tab's payload
// (screenshot data URL + detected line boxes at scale 1), build the same
// hover-lazy / eager-push overlay the content script provides in-page.

"use strict";

const params = new URLSearchParams(location.search);
document.getElementById("src").textContent = params.get("url") || "";

const stage = document.getElementById("stage");
const lineEls = new Map();
const requested = new Set();

function fillLine(line) {
  const el = lineEls.get(line.index);
  if (!el || el.classList.contains("ocrs-done")) return;
  el.classList.add("ocrs-done");
  requested.add(line.index);
  const baseL = parseFloat(el.style.left);
  const baseT = parseFloat(el.style.top);
  for (const w of line.words) {
    const d = document.createElement("div");
    d.className = "ocrs-word";
    d.textContent = w.text;
    const [l, t, r, b] = w.rect;
    Object.assign(d.style, {
      left: `${l - baseL}px`,
      top: `${t - baseT}px`,
      width: `${r - l}px`,
      height: `${b - t}px`,
      fontSize: `${Math.max(b - t - 2, 6)}px`,
    });
    el.appendChild(d);
  }
}

function recognize(indexes) {
  const todo = indexes.filter((i) => !requested.has(i));
  if (!todo.length) return;
  todo.forEach((i) => requested.add(i));
  chrome.runtime.sendMessage(
    { method: "recognizeLines", lineIndexes: todo },
    (resp) => {
      if (!resp || resp.error) {
        todo.forEach((i) => requested.delete(i));
        return;
      }
      resp.lines.forEach(fillLine);
    },
  );
}

chrome.runtime.onMessage.addListener((request) => {
  if (request.method === "linesRecognized") request.lines.forEach(fillLine);
});

chrome.runtime.sendMessage({ method: "viewerReady" }, (payload) => {
  if (!payload) return;
  document.getElementById("shot").src = payload.dataUrl;
  for (const { index, box } of payload.lines) {
    const el = document.createElement("div");
    el.className = "ocrs-line";
    Object.assign(el.style, {
      left: `${box.left}px`,
      top: `${box.top}px`,
      width: `${box.right - box.left}px`,
      height: `${box.bottom - box.top}px`,
    });
    el.addEventListener("mouseenter", () => recognize([index]));
    stage.appendChild(el);
    lineEls.set(index, el);
  }
});

window.addEventListener("unload", () => {
  chrome.runtime.sendMessage({ method: "closeSession" });
});
