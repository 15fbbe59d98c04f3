"""LibriSpeech corpus builder: download -> extract -> process -> instruction JSON.

Capability match for the reference's src/get_librispeech.py (SURVEY.md §2
'Corpus builder', §3.5): 7 openslr subsets, parallel download + extraction,
per-chapter transcript parsing + audio organization, case-normalizing text
cleanup, instruction-template example generation with --limit, a
dataset_stats.txt summary, and a dataset_config.json keymap consumed by the
training dataset (which, unlike the reference, actually honors it —
data/dataset.py).

Emits (reference src/get_librispeech.py:476-490):
    {output_dir}/metadata.json         all parsed items
    {output_dir}/examples.json         instruction examples (limited/shuffled)
    {output_dir}/dataset_config.json   key mapping for training
    {output_dir}/dataset_stats.txt     human-readable stats
    {output_dir}/audio/{subset}/{speaker}/{chapter}/*.flac

This is a host-side tool: plain Python + thread/process pools; no JAX.
Downloads are gated behind --download (zero-egress environments run the
process stage against an existing extraction).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import random
import shutil
import tarfile
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor, as_completed
from typing import Dict, List, Optional

logger = logging.getLogger("audio_llama_tpu")

# Subset -> archive URL (reference src/get_librispeech.py:36-44).
LIBRISPEECH_SUBSETS = {
    "test-clean": "https://www.openslr.org/resources/12/test-clean.tar.gz",
    "test-other": "https://www.openslr.org/resources/12/test-other.tar.gz",
    "dev-clean": "https://www.openslr.org/resources/12/dev-clean.tar.gz",
    "dev-other": "https://www.openslr.org/resources/12/dev-other.tar.gz",
    "train-clean-100": "https://www.openslr.org/resources/12/train-clean-100.tar.gz",
    "train-clean-360": "https://www.openslr.org/resources/12/train-clean-360.tar.gz",
    "train-other-500": "https://www.openslr.org/resources/12/train-other-500.tar.gz",
}

# Instruction templates (reference src/get_librispeech.py:47-64).
INSTRUCTION_TEMPLATES = [
    "What does the person say in this audio clip?",
    "Please transcribe this audio recording.",
    "Can you tell me what was said in this audio?",
    "Convert this speech to text.",
    "Write down what you hear in this audio clip.",
    "What words were spoken in this recording?",
    "Provide a transcription of this audio.",
    "What is being said in this audio file?",
    "Please put into text what is spoken in this audio.",
    "Transcribe the spoken content of this recording.",
    "Listen to this audio clip and write down the spoken content word for word.",
    "This is a segment from the LibriSpeech dataset. What is being said?",
    "Please create a verbatim transcript of this audio recording.",
    "I need a precise transcription of this speech sample. What is said?",
    "What is the exact text being narrated in this audio?",
    "Provide a detailed transcription of the speech in this audio file.",
]


def clean_text(text: str) -> str:
    """LibriSpeech transcripts are ALL-CAPS; fold to sentence case
    (reference src/get_librispeech.py:116-129)."""
    if not text.isupper():
        return text
    sentences = [
        (s[0].upper() + s[1:]) if s else s for s in text.lower().split(". ")
    ]
    out = ". ".join(sentences)
    if out and out[0].islower():
        out = out[0].upper() + out[1:]
    return out


# ---------------------------------------------------------------------------
# Download + extract (network-gated)
# ---------------------------------------------------------------------------

def download_subset(subset: str, download_dir: str, chunk_mb: int = 1) -> str:
    """Stream one archive to download_dir; skips if already present."""
    import urllib.request

    url = LIBRISPEECH_SUBSETS[subset]
    os.makedirs(download_dir, exist_ok=True)
    path = os.path.join(download_dir, os.path.basename(url))
    if os.path.exists(path):
        logger.info("already downloaded: %s", path)
        return path
    tmp = path + ".part"
    with urllib.request.urlopen(url) as r, open(tmp, "wb") as f:
        shutil.copyfileobj(r, f, chunk_mb * 1024 * 1024)
    os.replace(tmp, path)
    return path


def download_all(subsets: List[str], download_dir: str, parallel: int = 4) -> List[str]:
    with ThreadPoolExecutor(max_workers=parallel) as ex:
        futs = {ex.submit(download_subset, s, download_dir): s for s in subsets}
        return [f.result() for f in as_completed(futs)]


def extract_tar(archive: str, extract_dir: str) -> str:
    os.makedirs(extract_dir, exist_ok=True)
    with tarfile.open(archive, "r:gz") as tf:
        tf.extractall(extract_dir)
    return extract_dir


def extract_all(archives: List[str], extract_dir: str, parallel: int = 2):
    with ProcessPoolExecutor(max_workers=parallel) as ex:
        list(ex.map(extract_tar, archives, [extract_dir] * len(archives)))


# ---------------------------------------------------------------------------
# Processing (offline)
# ---------------------------------------------------------------------------

def process_chapter(args) -> List[Dict]:
    """Parse one chapter dir: trans.txt + .flac files -> metadata items,
    copying audio into the organized audio tree
    (reference src/get_librispeech.py:170-238)."""
    chapter_path, audio_dir, subset, copy_audio = args
    speaker_id, chapter_id = os.path.normpath(chapter_path).split(os.sep)[-2:]
    trans = os.path.join(chapter_path, f"{speaker_id}-{chapter_id}.trans.txt")
    if not os.path.exists(trans):
        return []
    transcriptions = {}
    with open(trans, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split(" ", 1)
            if len(parts) == 2:
                transcriptions[parts[0]] = parts[1]

    out_dir = os.path.join(audio_dir, subset, speaker_id, chapter_id)
    os.makedirs(out_dir, exist_ok=True)
    items = []
    for name in sorted(os.listdir(chapter_path)):
        if not name.endswith(".flac"):
            continue
        file_id = name[: -len(".flac")]
        if file_id not in transcriptions:
            continue
        if copy_audio:
            shutil.copyfile(
                os.path.join(chapter_path, name), os.path.join(out_dir, name)
            )
        raw = transcriptions[file_id]
        items.append(
            {
                "audio_paths": os.path.join(subset, speaker_id, chapter_id, name),
                "speaker_id": speaker_id,
                "chapter_id": chapter_id,
                "file_id": file_id,
                "subset": subset,
                "text": "",  # instruction filled by generate_examples
                "response": clean_text(raw),
                "metadata": {
                    "original_transcript": raw,
                    "speaker_id": speaker_id,
                    "subset": subset,
                },
            }
        )
    return items


def process_subset(
    subset: str,
    extract_dir: str,
    audio_dir: str,
    parallel: Optional[int] = None,
    copy_audio: bool = True,
) -> List[Dict]:
    """Walk LibriSpeech/{subset}/{speaker}/{chapter} and process chapters in
    a process pool (reference src/get_librispeech.py:131-168)."""
    root = os.path.join(extract_dir, "LibriSpeech", subset)
    if not os.path.isdir(root):
        logger.warning("subset directory not found: %s", root)
        return []
    chapters = [
        os.path.join(root, spk, ch)
        for spk in sorted(os.listdir(root))
        if os.path.isdir(os.path.join(root, spk))
        for ch in sorted(os.listdir(os.path.join(root, spk)))
        if os.path.isdir(os.path.join(root, spk, ch))
    ]
    parallel = parallel or max(1, (os.cpu_count() or 2) - 1)
    work = [(c, audio_dir, subset, copy_audio) for c in chapters]
    items: List[Dict] = []
    with ProcessPoolExecutor(max_workers=parallel) as ex:
        for res in ex.map(process_chapter, work):
            items.extend(res)
    logger.info("%s: %d items from %d chapters", subset, len(items), len(chapters))
    return items


# ---------------------------------------------------------------------------
# Example generation + artifacts
# ---------------------------------------------------------------------------

def generate_examples(
    metadata: List[Dict],
    output_path: str,
    limit: Optional[int] = None,
    seed: int = 42,
    audio_placeholder: bool = False,
) -> List[Dict]:
    """Shuffle, cap at limit, attach a random instruction template per item
    (reference src/get_librispeech.py:240-272). With audio_placeholder the
    prompts carry a literal '<audio></audio>' marker so splice_mode='inplace'
    training splices the audio block at the placeholder position."""
    rng = random.Random(seed)
    examples = list(metadata)
    rng.shuffle(examples)
    if limit and limit < len(examples):
        examples = examples[:limit]
    for item in examples:
        text = rng.choice(INSTRUCTION_TEMPLATES)
        if audio_placeholder:
            text = f"<audio></audio> {text}"
        item["text"] = text
    with open(output_path, "w", encoding="utf-8") as f:
        json.dump(examples, f, ensure_ascii=False, indent=2)
    logger.info("wrote %d examples to %s", len(examples), output_path)
    return examples


def create_dataset_stats(examples: List[Dict], output_dir: str) -> str:
    """dataset_stats.txt: totals, per-subset and per-speaker distributions
    (reference src/get_librispeech.py:274-317)."""
    path = os.path.join(output_dir, "dataset_stats.txt")
    subsets: Dict[str, int] = {}
    speakers: Dict[str, int] = {}
    total_words = 0
    for e in examples:
        subsets[e.get("subset", "unknown")] = subsets.get(e.get("subset", "unknown"), 0) + 1
        spk = e.get("speaker_id", "unknown")
        speakers[spk] = speakers.get(spk, 0) + 1
        total_words += len(e.get("response", "").split())
    n = max(len(examples), 1)
    with open(path, "w", encoding="utf-8") as f:
        f.write("DATASET STATISTICS\n")
        f.write(f"Total examples: {len(examples)}\n")
        f.write(f"Total words: {total_words}\n")
        f.write(f"Average words per example: {total_words / n:.1f}\n\n")
        f.write("SUBSET DISTRIBUTION:\n")
        for s, c in sorted(subsets.items(), key=lambda kv: -kv[1]):
            f.write(f"  - {s}: {c} examples ({100 * c / n:.1f}%)\n")
        f.write("\nSPEAKER DISTRIBUTION:\n")
        f.write(f"  Total unique speakers: {len(speakers)}\n")
        f.write("  Top 10 speakers:\n")
        for s, c in sorted(speakers.items(), key=lambda kv: -kv[1])[:10]:
            f.write(f"    - Speaker {s}: {c} examples ({100 * c / n:.1f}%)\n")
    return path


def create_dataset_config(output_dir: str) -> Dict:
    """dataset_config.json consumed by the trainer's --dataset_config
    (reference src/get_librispeech.py:319-333)."""
    config = {
        "audio_key": "audio_paths",
        "text_key": "text",
        "response_key": "response",
        "dataset_name": "librispeech",
    }
    with open(os.path.join(output_dir, "dataset_config.json"), "w") as f:
        json.dump(config, f, indent=2)
    return config


def build(
    output_dir: str,
    subsets: List[str],
    extract_dir: Optional[str] = None,
    download: bool = False,
    limit: Optional[int] = None,
    parallel: int = 4,
    seed: int = 42,
    audio_placeholder: bool = False,
) -> List[Dict]:
    """Full pipeline; returns the generated examples."""
    os.makedirs(output_dir, exist_ok=True)
    extract_dir = extract_dir or os.path.join(output_dir, "extracted")
    if download:
        archives = download_all(subsets, os.path.join(output_dir, "downloads"), parallel)
        extract_all(archives, extract_dir, min(parallel, 2))
    audio_dir = os.path.join(output_dir, "audio")
    metadata: List[Dict] = []
    for s in subsets:
        metadata.extend(process_subset(s, extract_dir, audio_dir, parallel))
    with open(os.path.join(output_dir, "metadata.json"), "w", encoding="utf-8") as f:
        json.dump(metadata, f, ensure_ascii=False, indent=2)
    examples = generate_examples(
        metadata, os.path.join(output_dir, "examples.json"), limit, seed,
        audio_placeholder=audio_placeholder,
    )
    create_dataset_stats(examples, output_dir)
    create_dataset_config(output_dir)
    return examples


def main(argv=None):
    p = argparse.ArgumentParser(description="Build LibriSpeech instruction corpus")
    p.add_argument("--subsets", nargs="+", default=["dev-clean"],
                   choices=sorted(LIBRISPEECH_SUBSETS))
    p.add_argument("--output_dir", type=str, default="./librispeech_data")
    p.add_argument("--extract_dir", type=str, default=None,
                   help="existing extraction root (contains LibriSpeech/)")
    p.add_argument("--download", action="store_true",
                   help="download archives first (needs network)")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--parallel", type=int, default=4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--audio_placeholder", action="store_true",
                   help="bake '<audio></audio>' into prompts (for "
                        "splice_mode='inplace' training)")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    build(
        args.output_dir, args.subsets, args.extract_dir, args.download,
        args.limit, args.parallel, args.seed,
        audio_placeholder=args.audio_placeholder,
    )


if __name__ == "__main__":
    main()
