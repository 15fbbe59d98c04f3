"""HFTokenizer adapter tests against a synthetic (offline) HF fast tokenizer.

This is the production tokenizer path (reference src/train.py:196-202,
src/dataloaders.py:44-46); the byte tokenizer used elsewhere in the suite
does not share its encode/pad/eos plumbing — notably the add_eos append
semantics, where overwriting the last token silently corrupted every
training target until fixed.
"""

import numpy as np
import pytest

pytest.importorskip("transformers")
pytest.importorskip("tokenizers")


@pytest.fixture(scope="module")
def hf_tok_dir(tmp_path_factory):
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import PreTrainedTokenizerFast

    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3}
    for i, w in enumerate(
        "the quick brown fox jumps over lazy dog transcribe audio clip this is a".split()
    ):
        vocab[w] = 4 + i
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        pad_token="<pad>", bos_token="<s>", eos_token="</s>", unk_token="<unk>",
    )
    d = tmp_path_factory.mktemp("hftok")
    fast.save_pretrained(str(d))
    return str(d)


def test_special_tokens_and_ids(hf_tok_dir):
    from audio_llama_tpu.data.tokenizer import AUDIO_END_TOKEN, AUDIO_START_TOKEN, HFTokenizer

    tk = HFTokenizer(hf_tok_dir)
    assert tk.added == 2  # <audio>, </audio> registered
    sid = tk.token_to_id(AUDIO_START_TOKEN)
    eid = tk.token_to_id(AUDIO_END_TOKEN)
    assert sid != eid and sid is not None and eid is not None
    assert tk.pad_id is not None and tk.eos_id is not None


def test_add_eos_appends_instead_of_overwriting(hf_tok_dir):
    """Regression for the silent last-token corruption."""
    from audio_llama_tpu.data.tokenizer import HFTokenizer

    tk = HFTokenizer(hf_tok_dir)
    ids_plain, mask_plain = tk.encode(
        "the quick brown fox", max_length=32, pad_to_max=False, add_bos=False
    )
    ids_eos, mask_eos = tk.encode(
        "the quick brown fox", max_length=32, pad_to_max=False,
        add_bos=False, add_eos=True,
    )
    # all original tokens preserved, EOS appended
    assert len(ids_eos) == len(ids_plain) + 1
    np.testing.assert_array_equal(ids_eos[:-1], ids_plain)
    assert ids_eos[-1] == tk.eos_id
    assert mask_eos[-1] == 1


def test_padded_encode_places_eos_in_first_pad_slot(hf_tok_dir):
    from audio_llama_tpu.data.tokenizer import HFTokenizer

    tk = HFTokenizer(hf_tok_dir)
    ids, mask = tk.encode(
        "lazy dog", max_length=8, pad_to_max=True, add_bos=False, add_eos=True
    )
    n = int(mask.sum())
    assert len(ids) == 8
    assert ids[n - 1] == tk.eos_id
    assert (ids[n:] == tk.pad_id).all()


def test_truncation_cap_replaces_last(hf_tok_dir):
    from audio_llama_tpu.data.tokenizer import HFTokenizer

    tk = HFTokenizer(hf_tok_dir)
    ids, mask = tk.encode(
        "the quick brown fox jumps over lazy dog", max_length=4,
        pad_to_max=False, add_bos=False, add_eos=True,
    )
    assert len(ids) == 4  # capped
    assert ids[-1] == tk.eos_id


def test_decode_skips_specials(hf_tok_dir):
    from audio_llama_tpu.data.tokenizer import HFTokenizer

    tk = HFTokenizer(hf_tok_dir)
    ids, _ = tk.encode("transcribe this audio", add_bos=False, add_eos=True)
    out = tk.decode(ids, skip_special_tokens=True)
    assert "transcribe" in out and "</s>" not in out


def test_dataset_concat_labels_with_hf_tokenizer(hf_tok_dir, tmp_path):
    """Production data path: HF tokenizer + concat label mode — prompt masked,
    response supervised, EOS present at the end of the response."""
    import numpy as np

    from audio_llama_tpu.data.audio_io import write_wav
    from audio_llama_tpu.data.dataset import AudioLLMDataset, DatasetConfig
    from audio_llama_tpu.data.tokenizer import HFTokenizer

    tk = HFTokenizer(hf_tok_dir)
    write_wav(str(tmp_path / "a.wav"),
              (np.random.RandomState(0).randn(4000) * 0.05).astype(np.float32),
              16000)
    entries = [{"audio_paths": "a.wav",
                "text": "transcribe this audio",
                "response": "the quick brown fox"}]
    cfg = DatasetConfig(text_max_length=16, max_audio_seconds=0.5,
                        label_mode="concat")
    ds = AudioLLMDataset(entries, str(tmp_path), tk, cfg)
    it = ds[0]
    labels = it["labels"]
    mask = it["attention_mask"]
    n = int(mask.sum())
    prompt_len = len(tk.encode("transcribe this audio", pad_to_max=False)[0])
    # prompt positions masked; response supervised; ends with EOS
    assert (labels[:prompt_len] == -100).all()
    assert (labels[prompt_len:n] != -100).all()
    assert labels[n - 1] == tk.eos_id
    assert it["input_ids"][n - 1] == tk.eos_id
