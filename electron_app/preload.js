// Context-isolated bridge: config access + log forwarding only.
"use strict";

const { contextBridge, ipcRenderer } = require("electron");

contextBridge.exposeInMainWorld("clientBridge", {
  getConfig: () => ipcRenderer.invoke("get-config"),
  log: (level, message) => ipcRenderer.send("renderer-log", level, message),
});
