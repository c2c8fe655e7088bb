// Service worker: capture the visible tab, open an OCR session on the
// ocrs-tpu server, detect text, and hand document-space line boxes to the
// content script. Recognition is HYBRID eager/lazy, like the reference
// extension: the content script asks for lines the user approaches
// (on-demand, highest priority), while a background pass recognizes the
// remaining lines in width-sorted batches of 4 and pushes the results
// (ocrs-extension/src/background.ts:373-434 behaviour).
//
// Capture fallbacks (background.ts:250-292 role): pages that refuse content
// scripts (chrome:// URLs, sandboxed origins) get the screenshot opened in
// an extension viewer tab with the same overlay; when even the screenshot
// fails, an error badge + a plain error page explain why.
//
// The in-browser WASM engine of the reference is replaced by the HTTP
// serving API (ocrs_tpu/serve.py) so the heavy math runs on a TPU host
// instead of the user's CPU.

importScripts("lib.js");

const DEFAULT_SERVER = "http://localhost:8765";
const EAGER_BATCH = 4;

async function serverUrl() {
  const { server } = await chrome.storage?.sync?.get?.({ server: DEFAULT_SERVER })
    ?? { server: DEFAULT_SERVER };
  return (server || DEFAULT_SERVER).replace(/\/$/, "");
}

// tabId -> { sessionId, base, scale, lines, requested } — `requested`
// dedups eager vs. lazy work; `lines` keeps detect results for the eager
// planner. Viewer tabs get their own entry (scale 1).
const tabSessions = new Map();
// Viewer tabs created by the fallback path, waiting for their payload:
// tabId -> { dataUrl, lines }.
const pendingViewers = new Map();

async function post(base, path, body, contentType) {
  const res = await fetch(base + path, {
    method: "POST",
    headers: contentType ? { "Content-Type": contentType } : {},
    body,
  });
  if (!res.ok) throw new Error(`${path}: HTTP ${res.status}`);
  return res;
}

async function openSession(base, png) {
  const { id } = await (await post(base, "/session", png,
    "application/octet-stream")).json();
  const { lines } = await (
    await post(base, `/session/${id}/detect`, null)
  ).json();
  return { id, lines };
}

async function recognizeOnServer(sess, lineIndexes) {
  const res = await post(
    sess.base,
    `/session/${sess.sessionId}/recognize`,
    JSON.stringify({ lines: lineIndexes }),
    "application/json",
  );
  const { lines } = await res.json();
  // Word rects back to overlay coordinates.
  return lines.map((l) => ({
    index: l.index,
    text: l.text,
    words: (l.words || []).map((w) => ({
      text: w.text,
      rect: w.rect.map((v) => v / sess.scale),
    })),
  }));
}

/** Background pass: recognize everything the user hasn't hovered yet, in
 * width-sorted batches (similar widths share a recognition bucket — the
 * reference measured up to ~45% lower per-line time, background.ts:383).
 * On-demand requests win races via the shared `requested` set; a replaced
 * or closed session aborts the loop. */
async function eagerRecognize(tabId, sessionId) {
  const sess = tabSessions.get(tabId);
  if (!sess || sess.sessionId !== sessionId) return;
  for (const batch of OcrsLib.eagerBatches(sess.lines, sess.requested, EAGER_BATCH)) {
    const live = tabSessions.get(tabId);
    if (!live || live.sessionId !== sessionId) return; // dismissed/replaced
    const todo = OcrsLib.pendingOnly(batch, live.requested);
    if (!todo.length) continue;
    todo.forEach((i) => live.requested.add(i));
    try {
      const lines = await recognizeOnServer(live, todo);
      chrome.tabs.sendMessage(tabId, { method: "linesRecognized", lines })
        .catch?.(() => {});
    } catch (err) {
      // Leave the lines lazily recoverable and stop hammering the server.
      todo.forEach((i) => live.requested.delete(i));
      console.warn("eager recognition stopped:", err);
      return;
    }
  }
}

function detectedBoxes(lines, scale) {
  return lines.map((line) => ({
    index: line.index,
    box: OcrsLib.toDocumentBox(OcrsLib.lineUnionRect(line.words), scale),
  }));
}

/** Restricted page (no content scripts): show the screenshot in an
 * extension viewer tab with the same overlay (reference fallback,
 * background.ts:258-278). */
async function openViewerFallback(base, png, dataUrl, sourceUrl) {
  const { id, lines } = await openSession(base, png);
  const viewer = await chrome.tabs.create({
    url: chrome.runtime.getURL("viewer.html")
      + `?url=${encodeURIComponent(sourceUrl || "")}`,
  });
  tabSessions.set(viewer.id, {
    sessionId: id, base, scale: 1, lines, requested: new Set(), scroll: [0, 0],
  });
  pendingViewers.set(viewer.id, {
    dataUrl,
    lines: detectedBoxes(lines, 1),
  });
}

chrome.action.onClicked.addListener(async (tab) => {
  if (!tab.id) return;
  const base = await serverUrl();
  chrome.action.setBadgeText({ tabId: tab.id, text: "…" });
  try {
    // Screenshot of the visible viewport. Its pixel size is
    // devicePixelRatio * zoom times the CSS viewport (the reference corrects
    // coordinates the same way — background.ts tabImageToDocumentCoords).
    let dataUrl;
    try {
      dataUrl = await chrome.tabs.captureVisibleTab({ format: "png" });
    } catch (err) {
      // Can't even screenshot (e.g. disallowed chrome:// page): error page.
      chrome.tabs.create({
        url: chrome.runtime.getURL("error.html")
          + `?url=${encodeURIComponent(tab.url || "")}`
          + `&reason=${encodeURIComponent(String(err))}`,
      });
      return;
    }
    const png = await (await fetch(dataUrl)).arrayBuffer();

    let view;
    try {
      [{ result: view }] = await chrome.scripting.executeScript({
        target: { tabId: tab.id },
        func: () => ({
          dpr: window.devicePixelRatio,
          w: window.innerWidth,
          sx: window.scrollX,
          sy: window.scrollY,
        }),
      });
    } catch (err) {
      // Content scripts refused (chrome:// page, sandboxed origin): show
      // the screenshot in a viewer tab instead.
      await openViewerFallback(base, png, dataUrl, tab.url);
      return;
    }

    const { id, lines } = await openSession(base, png);

    // Image px per CSS px (handles page zoom + HiDPI in one factor).
    const img = await createImageBitmap(new Blob([png], { type: "image/png" }));
    const scale = img.width / view.w;

    tabSessions.set(tab.id, {
      sessionId: id, base, scale, lines, requested: new Set(),
      scroll: [view.sx, view.sy],
    });

    await chrome.scripting.executeScript({
      target: { tabId: tab.id },
      files: ["content.js"],
    });
    await chrome.tabs.sendMessage(tab.id, {
      method: "showDetectedLines",
      lines: detectedBoxes(lines, scale),
      scroll: [view.sx, view.sy],
    });

    // Hybrid recognition: the content script pulls hovered lines on demand;
    // this pass pushes everything else.
    eagerRecognize(tab.id, id);
  } finally {
    chrome.action.setBadgeText({ tabId: tab.id, text: "" });
  }
});

chrome.runtime.onMessage.addListener((request, sender, sendResponse) => {
  const tabId = sender.tab?.id;
  if (request.method === "viewerReady" && tabId) {
    const payload = pendingViewers.get(tabId);
    pendingViewers.delete(tabId);
    sendResponse(payload || null);
    if (payload) {
      const sess = tabSessions.get(tabId);
      if (sess) eagerRecognize(tabId, sess.sessionId);
    }
    return false;
  }
  if (request.method === "recognizeLines" && tabId) {
    const sess = tabSessions.get(tabId);
    if (!sess) { sendResponse({ lines: [] }); return true; }
    const todo = OcrsLib.pendingOnly(request.lineIndexes, sess.requested);
    todo.forEach((i) => sess.requested.add(i));
    if (!todo.length) { sendResponse({ lines: [] }); return true; }
    recognizeOnServer(sess, todo)
      .then((lines) => sendResponse({ lines }))
      .catch((err) => {
        todo.forEach((i) => sess.requested.delete(i));
        sendResponse({ error: String(err) });
      });
    return true; // async sendResponse
  }
  if (request.method === "closeSession" && tabId) {
    const sess = tabSessions.get(tabId);
    tabSessions.delete(tabId);
    if (sess) {
      fetch(`${sess.base}/session/${sess.sessionId}`, { method: "DELETE" })
        .catch(() => {});
    }
    return false;
  }
  return false;
});
