// Content script: positioned text overlay with native selection over the
// captured viewport — the role of the reference's content.ts DOM overlay
// (ocrs-extension/src/content.ts:68-180). Line boxes arrive in document
// coordinates from the service worker; hovering a line requests its
// recognition lazily (background.ts:196-211 pattern); recognized words
// become transparent-ink, selection-visible text the user can copy like
// page text. Escape dismisses the overlay and closes the server session.

(() => {
  const OVERLAY_ID = "__ocrs_tpu_overlay__";
  const prev = document.getElementById(OVERLAY_ID);
  if (prev) prev.remove();

  const overlay = document.createElement("div");
  overlay.id = OVERLAY_ID;
  Object.assign(overlay.style, {
    position: "absolute",
    left: "0",
    top: "0",
    width: "0",
    height: "0",
    zIndex: "2147483646",
  });
  document.documentElement.appendChild(overlay);

  const style = document.createElement("style");
  style.textContent = `
    #${OVERLAY_ID} .ocrs-line {
      position: absolute; cursor: text;
      outline: 1px solid rgba(64,128,255,.55);
      background: rgba(64,128,255,.08);
    }
    #${OVERLAY_ID} .ocrs-line.ocrs-done { outline-color: rgba(32,192,96,.4); background: none; }
    #${OVERLAY_ID} .ocrs-word {
      position: absolute; color: transparent; white-space: pre; line-height: 1;
      font-family: sans-serif; overflow: hidden; user-select: text;
    }
    #${OVERLAY_ID} .ocrs-word::selection { background: rgba(64,128,255,.45); }
  `;
  overlay.appendChild(style);

  const lineEls = new Map();
  const requested = new Set();
  let scroll = [0, 0];

  function showLines(lines, scrollOffset) {
    scroll = scrollOffset || [0, 0];
    for (const { index, box } of lines) {
      const el = document.createElement("div");
      el.className = "ocrs-line";
      Object.assign(el.style, {
        left: `${box.left + scroll[0]}px`,
        top: `${box.top + scroll[1]}px`,
        width: `${box.right - box.left}px`,
        height: `${box.bottom - box.top}px`,
      });
      el.addEventListener("mouseenter", () => recognize([index]));
      overlay.appendChild(el);
      lineEls.set(index, el);
    }
  }

  function fillLine(line) {
    // Materialize one recognized line as selectable transparent-ink words
    // — shared by the lazy (hover pull) and eager (worker push) paths.
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
        left: `${l + scroll[0] - baseL}px`,
        top: `${t + scroll[1] - baseT}px`,
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

  function dismiss() {
    overlay.remove();
    chrome.runtime.sendMessage({ method: "closeSession" });
    document.removeEventListener("keydown", onKey, true);
  }
  function onKey(e) {
    if (e.key === "Escape") dismiss();
  }
  document.addEventListener("keydown", onKey, true);

  chrome.runtime.onMessage.addListener((request) => {
    if (request.method === "showDetectedLines") {
      showLines(request.lines, request.scroll);
    }
    if (request.method === "linesRecognized") {
      // Eager background pass (width-sorted batches in the worker) pushing
      // results before the user hovers anything.
      request.lines.forEach(fillLine);
    }
  });
})();
