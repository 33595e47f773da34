"""HTTP client for a remote llama-gguf-tpu (or any OpenAI-compatible) server.

Parity target: /root/reference/src/client.rs:117-322 (RemoteChatClient:
chat/completions against a remote endpoint, streaming, model listing,
health). Uses `requests`; SSE streaming yields content deltas as they
arrive (the server sends true token streaming).
"""

from __future__ import annotations

import json
from typing import Any, Iterator

import requests


class RemoteError(RuntimeError):
    pass


class RemoteChatClient:
    def __init__(self, base_url: str = "http://127.0.0.1:8080",
                 api_key: str | None = None, model: str | None = None,
                 timeout: float = 300.0):
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.model = model
        self.timeout = timeout
        self._session = requests.Session()
        if api_key:
            self._session.headers["Authorization"] = f"Bearer {api_key}"

    # -- info -------------------------------------------------------------------

    def health(self) -> dict:
        return self._get("/health")

    def models(self) -> list[str]:
        return [m["id"] for m in self._get("/v1/models")["data"]]

    def queue_status(self) -> dict:
        return self._get("/v1/queue")

    # -- chat -------------------------------------------------------------------

    def chat(self, messages: list[dict], **opts) -> str:
        body = {"messages": messages, "model": self.model, **opts}
        d = self._post("/v1/chat/completions", body)
        msg = d["choices"][0]["message"]
        return msg.get("content") or ""

    def chat_streaming(self, messages: list[dict], **opts) -> Iterator[str]:
        body = {"messages": messages, "model": self.model, "stream": True,
                **opts}
        for chunk in self._post_sse("/v1/chat/completions", body):
            delta = chunk["choices"][0].get("delta", {})
            piece = delta.get("content")
            if piece:
                yield piece

    def complete(self, prompt: str, **opts) -> str:
        d = self._post("/v1/completions", {"prompt": prompt,
                                           "model": self.model, **opts})
        return d["choices"][0]["text"]

    def embed(self, texts: str | list[str]) -> list[list[float]]:
        d = self._post("/v1/embeddings", {"input": texts,
                                          "model": self.model})
        return [e["embedding"] for e in d["data"]]

    # -- transport ----------------------------------------------------------------

    def _get(self, path: str) -> dict:
        r = self._session.get(self.base_url + path, timeout=self.timeout)
        return self._check(r)

    def _post(self, path: str, body: dict) -> dict:
        r = self._session.post(self.base_url + path, json=body,
                               timeout=self.timeout)
        return self._check(r)

    def _post_sse(self, path: str, body: dict) -> Iterator[dict]:
        r = self._session.post(self.base_url + path, json=body, stream=True,
                               timeout=self.timeout)
        if r.status_code != 200:
            self._check(r)
        for line in r.iter_lines():
            if not line.startswith(b"data: "):
                continue
            payload = line[6:]
            if payload == b"[DONE]":
                return
            yield json.loads(payload)

    @staticmethod
    def _check(r: requests.Response) -> dict:
        if r.status_code != 200:
            try:
                msg = r.json()["error"]["message"]
            except Exception:
                msg = r.text[:200]
            raise RemoteError(f"HTTP {r.status_code}: {msg}")
        return r.json()
