// MV3 extension pages disallow inline scripts; fill in the failure detail
// from the query string here.
"use strict";
const q = new URLSearchParams(location.search);
const url = q.get("url"), reason = q.get("reason");
document.getElementById("detail").textContent =
  (url ? `Page: ${url}. ` : "") + (reason ? `Error: ${reason}` : "");
