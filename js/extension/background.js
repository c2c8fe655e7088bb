// Service worker: capture the visible tab, open an OCR session on the
// ocrs-tpu server, detect text, and hand document-space line boxes to the
// content script. Recognition stays LAZY: the content script asks for lines
// as the user approaches them and this worker proxies those requests to the
// server's /session/<id>/recognize route.
//
// This is the role of the reference extension's background.ts (detection on
// action click, per-line recognizeText message handler —
// ocrs-extension/src/background.ts:196-211) with the in-browser WASM engine
// replaced by the HTTP serving API (ocrs_tpu/serve.py), so the heavy math
// runs on a TPU host instead of the user's CPU.

const DEFAULT_SERVER = "http://localhost:8765";

async function serverUrl() {
  const { server } = await chrome.storage?.sync?.get?.({ server: DEFAULT_SERVER })
    ?? { server: DEFAULT_SERVER };
  return (server || DEFAULT_SERVER).replace(/\/$/, "");
}

// tabId -> { sessionId, base, scale } for lazy recognition.
const tabSessions = new Map();

async function post(base, path, body, contentType) {
  const res = await fetch(base + path, {
    method: "POST",
    headers: contentType ? { "Content-Type": contentType } : {},
    body,
  });
  if (!res.ok) throw new Error(`${path}: HTTP ${res.status}`);
  return res;
}

function lineBox(words, scale) {
  // Union of the line's word rects, image -> document (CSS px) coordinates.
  let l = Infinity, t = Infinity, r = -Infinity, b = -Infinity;
  for (const w of words) {
    l = Math.min(l, w.rect[0]); t = Math.min(t, w.rect[1]);
    r = Math.max(r, w.rect[2]); b = Math.max(b, w.rect[3]);
  }
  return { left: l / scale, top: t / scale, right: r / scale, bottom: b / scale };
}

chrome.action.onClicked.addListener(async (tab) => {
  if (!tab.id) return;
  const base = await serverUrl();

  // Screenshot of the visible viewport. Its pixel size is
  // devicePixelRatio * zoom times the CSS viewport (the reference corrects
  // coordinates the same way — background.ts tabImageToDocumentCoords).
  const dataUrl = await chrome.tabs.captureVisibleTab({ format: "png" });
  const png = await (await fetch(dataUrl)).arrayBuffer();

  const [{ result: view }] = await chrome.scripting.executeScript({
    target: { tabId: tab.id },
    func: () => ({
      dpr: window.devicePixelRatio,
      w: window.innerWidth,
      sx: window.scrollX,
      sy: window.scrollY,
    }),
  });

  const { id } = await (await post(base, "/session", png,
    "application/octet-stream")).json();
  const { lines } = await (
    await post(base, `/session/${id}/detect`, null)
  ).json();

  // Image px per CSS px (handles page zoom + HiDPI in one factor).
  const img = await createImageBitmap(new Blob([png], { type: "image/png" }));
  const scale = img.width / view.w;

  tabSessions.set(tab.id, { sessionId: id, base, scale, scroll: [view.sx, view.sy] });

  const boxes = lines.map((line) => ({
    index: line.index,
    box: lineBox(line.words, scale),
  }));

  await chrome.scripting.executeScript({
    target: { tabId: tab.id },
    files: ["content.js"],
  });
  await chrome.tabs.sendMessage(tab.id, {
    method: "showDetectedLines",
    lines: boxes,
    scroll: [view.sx, view.sy],
  });
});

chrome.runtime.onMessage.addListener((request, sender, sendResponse) => {
  if (request.method === "recognizeLines" && sender.tab?.id) {
    const sess = tabSessions.get(sender.tab.id);
    if (!sess) { sendResponse({ lines: [] }); return true; }
    (async () => {
      const res = await post(
        sess.base,
        `/session/${sess.sessionId}/recognize`,
        JSON.stringify({ lines: request.lineIndexes }),
        "application/json",
      );
      const { lines } = await res.json();
      // Word rects back to document coordinates for the overlay.
      sendResponse({
        lines: lines.map((l) => ({
          index: l.index,
          text: l.text,
          words: (l.words || []).map((w) => ({
            text: w.text,
            rect: w.rect.map((v) => v / sess.scale),
          })),
        })),
      });
    })().catch((err) => sendResponse({ error: String(err) }));
    return true; // async sendResponse
  }
  if (request.method === "closeSession" && sender.tab?.id) {
    const sess = tabSessions.get(sender.tab.id);
    tabSessions.delete(sender.tab.id);
    if (sess) {
      fetch(`${sess.base}/session/${sess.sessionId}`, { method: "DELETE" })
        .catch(() => {});
    }
    return false;
  }
  return false;
});
