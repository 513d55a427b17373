// Context-isolated bridge: config access, log forwarding, app quit.
"use strict";

const { contextBridge, ipcRenderer } = require("electron");

contextBridge.exposeInMainWorld("clientBridge", {
  getConfig: () => ipcRenderer.invoke("get-config"),
  log: (level, message) => ipcRenderer.send("renderer-log", level, message),
  quitApp: () => ipcRenderer.send("quit-app"),
});
