#!/usr/bin/env python
"""Start a server in-process and query it with the client."""
import sys
import threading

from llama_gguf_tpu.client import RemoteChatClient
from llama_gguf_tpu.server.app import ServerConfig, run_server

cfg = ServerConfig(model_path=sys.argv[1], port=8080, max_batch=4)
threading.Thread(target=run_server, args=(cfg,), daemon=True).start()

import time
client = RemoteChatClient("http://127.0.0.1:8080")
for _ in range(120):
    try:
        client.health(); break
    except Exception:
        time.sleep(1)
for piece in client.chat_streaming(
        [{"role": "user", "content": "Tell me a story"}], max_tokens=64):
    print(piece, end="", flush=True)
print()
