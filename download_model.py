#!/usr/bin/env python
"""One-shot fetch of Qwen/Qwen-VL-Chat into ./qwen-vl-chat-local.

Drop-in entry point matching reference ``download_model.py`` — snapshots
the tokenizer and model weights locally so offline compute nodes can
load with local_files_only.  tdax only needs the raw checkpoint files
(state dict + tokenizer), not a working torch runtime: weights are
converted to the JAX pytree by tdax.models.qwen_vl.convert at load time.
"""

MODEL_NAME = "Qwen/Qwen-VL-Chat"
SAVE_DIR = "./qwen-vl-chat-local"


def main() -> None:
    from transformers import AutoTokenizer

    print(f"Downloading tokenizer for {MODEL_NAME}...")
    tokenizer = AutoTokenizer.from_pretrained(MODEL_NAME, trust_remote_code=True)
    tokenizer.save_pretrained(SAVE_DIR)

    # weights: snapshot the raw files (no torch model instantiation needed)
    from huggingface_hub import snapshot_download
    print(f"Downloading weights for {MODEL_NAME}...")
    snapshot_download(MODEL_NAME, local_dir=SAVE_DIR)
    print(f"Saved to {SAVE_DIR}")


if __name__ == "__main__":
    main()
