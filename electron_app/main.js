// Electron main process for the streaming transcription client.
//
// Parity with the reference client (electron_app/main.js): backend URL and
// mode come from the environment / .env file, a strict CSP is injected on
// every response, and renderer logs are bridged to the main process.
"use strict";

const { app, BrowserWindow, ipcMain, session } = require("electron");
const fs = require("fs");
const path = require("path");

// Minimal .env loader (no dotenv dependency).
function loadDotEnv() {
  const envPath = path.join(__dirname, ".env");
  if (!fs.existsSync(envPath)) return;
  for (const line of fs.readFileSync(envPath, "utf8").split("\n")) {
    // trim() the captured value: the greedy (.*) keeps trailing CR from
    // CRLF-saved files (and trailing spaces), which corrupted every URL
    // and the injected CSP header built from it.
    const m = line.match(/^\s*([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.*)$/);
    if (m && !(m[1] in process.env)) process.env[m[1]] = m[2].trim();
  }
}
loadDotEnv();

const BACKEND_URL =
  process.env.LOCAL_BACKEND_URL || "http://127.0.0.1:8800";

function createWindow() {
  const win = new BrowserWindow({
    width: 900,
    height: 640,
    webPreferences: {
      preload: path.join(__dirname, "preload.js"),
      contextIsolation: true,
      nodeIntegration: false,
    },
  });

  // CSP: self + the configured backend only.
  session.defaultSession.webRequest.onHeadersReceived((details, cb) => {
    cb({
      responseHeaders: {
        ...details.responseHeaders,
        "Content-Security-Policy": [
          `default-src 'self'; connect-src 'self' ${BACKEND_URL}; ` +
            "style-src 'self' 'unsafe-inline'; script-src 'self'",
        ],
      },
    });
  });

  win.loadFile(path.join(__dirname, "renderer", "index.html"));
}

ipcMain.handle("get-config", () => ({
  backendUrl: BACKEND_URL,
  pollIntervalMs: parseInt(process.env.POLL_INTERVAL_MS || "100", 10),
  stepSizeS: parseFloat(process.env.STEP_SIZE_S || "0.05"),
}));

ipcMain.on("renderer-log", (_event, level, message) => {
  // eslint-disable-next-line no-console
  console.log(`[renderer:${level}] ${message}`);
});

// The error modal's "Quit app" button (parity with the reference's
// quitApp IPC, preload.js:3-11 there).
ipcMain.on("quit-app", () => {
  app.quit();
});

app.whenReady().then(createWindow);
app.on("window-all-closed", () => {
  if (process.platform !== "darwin") app.quit();
});
app.on("activate", () => {
  // macOS: the app outlives its window; the dock icon must reopen one.
  if (BrowserWindow.getAllWindows().length === 0) createWindow();
});
