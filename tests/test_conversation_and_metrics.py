"""Tests for conversation templates and LongBench metrics."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "eval", "LongBench")
)

from metrics import (  # noqa: E402
    classification_score,
    count_score,
    qa_f1_score,
    retrieval_score,
    rouge_score,
)

from omniserve_tpu.conversation import (  # noqa: E402
    get_conv_template,
    get_conv_template_name,
)


class TestConversation:
    def test_template_mapping(self):
        assert get_conv_template_name("meta-llama/Llama-3-8B") == "llama-3"
        assert get_conv_template_name("meta-llama/Llama-2-7b") == "llama-2"
        assert get_conv_template_name("mistralai/Mistral-7B") == "mistral"
        assert get_conv_template_name("lmsys/vicuna-7b") == "vicuna_v1.1"
        assert get_conv_template_name("some/random-model") == "raw"

    def test_llama3_format(self):
        conv = get_conv_template("llama-3")
        conv.set_system_message("Be terse.")
        conv.append_message("user", "Hi")
        conv.append_message("assistant", None)
        p = conv.get_prompt()
        assert p.startswith("<|begin_of_text|>")
        assert "<|start_header_id|>system<|end_header_id|>" in p
        assert p.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")

    def test_llama2_format(self):
        conv = get_conv_template("llama-2")
        conv.append_message(conv.roles[0], "Hello")
        conv.append_message(conv.roles[1], None)
        assert conv.get_prompt() == "<s>[INST] Hello [/INST]"

    def test_copy_isolates_messages(self):
        a = get_conv_template("mistral")
        a.append_message("user", "x")
        b = get_conv_template("mistral")
        assert b.messages == []


class TestMetrics:
    def test_qa_f1(self):
        assert qa_f1_score("Paris", "Paris") == 1.0
        assert qa_f1_score("the answer is Paris", "Paris") > 0
        assert qa_f1_score("London", "Paris") == 0.0

    def test_rouge_l(self):
        assert rouge_score("a b c d", "a b c d") == 1.0
        assert rouge_score("a x c y", "a b c d") > 0

    def test_classification(self):
        assert classification_score(
            "This is about sports", "sports",
            all_classes=["sports", "politics"],
        ) == 1.0
        assert classification_score(
            "sports and politics", "sports",
            all_classes=["sports", "politics"],
        ) == 0.5

    def test_retrieval_and_count(self):
        assert retrieval_score("Paragraph 7", "7") == 1.0
        assert retrieval_score("Paragraph 3", "7") == 0.0
        assert count_score("there are 12 unique ones", "12") == 1.0


def test_raw_template_is_verbatim():
    from omniserve_tpu.conversation import get_conv_template

    conv = get_conv_template("raw")
    conv.append_message(conv.roles[0] if conv.roles else "user",
                        "just the context text")
    conv.append_message(conv.roles[1] if conv.roles else "assistant", None)
    out = conv.get_prompt()
    assert out == "just the context text", out


def test_retrieval_and_count_scores_are_fractional():
    from metrics import count_score, retrieval_score

    # hedging with several numbers must not score 1.0
    assert retrieval_score("maybe 3, 7 or 12", "Paragraph 7") == 1 / 3
    assert retrieval_score("Paragraph 7", "Paragraph 7") == 1.0
    assert count_score("3 or 4", "4") == 0.5
    assert count_score("4", "4") == 1.0


def test_classification_ignores_substring_classes():
    from metrics import classification_score

    classes = ["description", "description of a person", "location"]
    assert classification_score(
        "description of a person", "description of a person", classes
    ) == 1.0
