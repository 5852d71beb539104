"""LLM-judge scoring via the OpenAI Batch API (parity: reference
``scripts/eval_gpt_batch.py``).

Protocol contract preserved bit-for-bit: the judge system/user prompt strings
(they define the metric), gpt-4o-mini-2024-07-18 model pin, jsonl payload
limits (<=49k items / 190MB per file), 60s polling, yes/no accuracy + 0-5
average score, token-cost printout ($0.075/M prompt + $0.30/M completion).

Requires network access + ``.openai_key``; everything before the upload
(payload build) and after the download (scoring) is pure and unit-testable.
"""

from __future__ import annotations

import argparse
import ast
import io
import json
import os
import time
from typing import Dict, List

JUDGE_MODEL = "gpt-4o-mini-2024-07-18"

JUDGE_SYSTEM = (
    "You are an intelligent chatbot designed for evaluating the correctness of generative outputs for"
    " question-answer pairs. "
    "Your task is to compare the predicted answer with the correct answer and determine if they match"
    " meaningfully. Here's how you can accomplish the task:"
    "------"
    "##INSTRUCTIONS: "
    "- Focus on the meaningful match between the predicted answer and the correct answer.\n"
    "- Consider synonyms or paraphrases as valid matches.\n"
    "- Evaluate the correctness of the prediction compared to the answer."
)


def judge_user_prompt(question: str, answer: str, pred: str) -> str:
    return (
        "Please evaluate the following video-based question-answer pair:\n\n"
        f"Question: {question}\n"
        f"Correct Answer: {answer}\n"
        f"Predicted Answer: {pred}\n\n"
        "Provide your evaluation only as a yes/no and score where the score is an integer value between"
        " 0 and 5, with 5 indicating the highest meaningful match. "
        "Please generate the response in the form of a Python dictionary string with keys 'pred' and"
        " 'score', where value of 'pred' is  a string of 'yes' or 'no' and value of 'score' is in INTEGER,"
        " not STRING."
        "DO NOT PROVIDE ANY OTHER OUTPUT TEXT OR EXPLANATION. Only provide the Python dictionary string. "
        "For example, your response should look like this: {'pred': 'yes', 'score': 4}."
    )


def build_payloads(prediction_set: Dict[str, Dict[str, str]]) -> List[str]:
    """One Batch-API request line per question id."""
    lines = []
    for key, qa in prediction_set.items():
        payload = {
            "custom_id": key,
            "method": "POST",
            "url": "/v1/chat/completions",
            "body": {
                "model": JUDGE_MODEL,
                "messages": [
                    {"role": "system", "content": JUDGE_SYSTEM},
                    {"role": "user", "content": judge_user_prompt(qa["q"], qa["a"], qa["pred"])},
                ],
                "max_tokens": 500,
            },
        }
        lines.append(json.dumps(payload))
    return lines


def shard_payloads(lines: List[str], max_items: int = 49000, max_mb: float = 190.0) -> List[List[str]]:
    """Respect Batch-API file limits (reference :70-104)."""
    shards: List[List[str]] = []
    cur: List[str] = []
    size = 0.0
    for line in lines:
        mb = len(line) / 1024 / 1024
        if cur and (size + mb > max_mb or len(cur) >= max_items):
            shards.append(cur)
            cur, size = [], 0.0
        cur.append(line)
        size += mb
    if cur:
        shards.append(cur)
    return shards


def parse_judge_responses(jsonl_text: str) -> Dict[str, Dict]:
    """Batch output jsonl -> {custom_id: {'pred','score'}} with safe fallback."""
    out: Dict[str, Dict] = {}
    for line in jsonl_text.split("\n"):
        if not line:
            continue
        linej = json.loads(line)
        try:
            prediction = ast.literal_eval(linej["response"]["body"]["choices"][0]["message"]["content"])
            assert "pred" in prediction and "score" in prediction
        except Exception:
            prediction = {"pred": "no", "score": 0}
        out[linej["custom_id"]] = prediction
    return out


def save_evaluation_result(jsonl_text: str, prediction_set: Dict[str, Dict], output_path: str) -> None:
    gpt_outputs = parse_judge_responses(jsonl_text)
    merged = {
        k: [gpt_outputs.get(k, {"pred": "no", "score": 0}), v] for k, v in prediction_set.items()
    }
    with open(output_path, "w") as f:
        json.dump(merged, f)


def print_calculated_performance(output_path: str):
    with open(output_path) as f:
        gpt_outputs = json.load(f)
    score_sum = yes_count = no_count = 0
    for _, v in gpt_outputs.items():
        score_sum += v[0]["score"]
        if "yes" in v[0]["pred"].lower():
            yes_count += 1
        else:
            no_count += 1
    count = yes_count + no_count
    accuracy = yes_count / max(count, 1)
    average_score = score_sum / max(count, 1)
    print("Yes count:", yes_count)
    print("No count:", no_count)
    print("Accuracy:", accuracy)
    print("Average score:", average_score)
    return accuracy, average_score


def print_token_usage(jsonl_text: str) -> None:
    prompt_tokens = completion_tokens = 0
    model = None
    for line in jsonl_text.split("\n"):
        if not line:
            continue
        body = json.loads(line)["response"]["body"]
        prompt_tokens += body["usage"]["prompt_tokens"]
        completion_tokens += body["usage"]["completion_tokens"]
        model = body["model"]
    print(f"Prompt tokens: {prompt_tokens}, Completion tokens: {completion_tokens}")
    if model == JUDGE_MODEL:
        print(f"Total Cost on {model}")
        print("${:.10f}".format(0.075 * prompt_tokens / 1e6 + 0.3 * completion_tokens / 1e6))
    else:
        print("IDK cost for this model")


def main() -> None:
    parser = argparse.ArgumentParser(description="question-answer-generation-using-gpt-4o-mini")
    parser.add_argument("--ckpt_name", default="", help="Name of checkpoint.")
    parser.add_argument("--benchmark", default="", help="Benchmark.")
    args = parser.parse_args()

    pred_path = f"eval_result/{args.ckpt_name}/{args.benchmark}_pred_merge.jsonl"
    batch_id_path = f"eval_result/{args.ckpt_name}/{args.benchmark}_gpt_batch_id.jsonl"
    return_path = f"eval_result/{args.ckpt_name}/{args.benchmark}_gpt_return.jsonl"
    output_path = f"eval_result/{args.ckpt_name}/{args.benchmark}_gpt.json"

    if os.path.exists(output_path):
        print("File", output_path, "already exists. Evaluation was already done!")
        print_calculated_performance(output_path)
        return

    import openai

    with open(".openai_key") as f:
        key = f.read().strip()
    if not key:
        raise ValueError("No OpenAI API keys found in .openai_key")
    client = openai.OpenAI(api_key=key)

    if not os.path.exists(pred_path):
        print("File", pred_path, "does not exist")
        return

    with open(pred_path) as f:
        preds = [json.loads(line) for line in f if line.strip()]
    prediction_set = {
        s["question_id"]: {"q": s["question"], "a": s["answer"], "pred": s["pred"]} for s in preds
    }

    if not os.path.exists(batch_id_path):
        shards = shard_payloads(build_payloads(prediction_set))
        submitted = []
        for i, shard in enumerate(shards):
            fileio = io.BytesIO("\n".join(shard).encode("utf-8"))
            fileio.name = f"{args.ckpt_name}_{args.benchmark}_{i}.jsonl"
            batch_file = client.files.create(file=fileio, purpose="batch")
            submitted.append(
                client.batches.create(
                    input_file_id=batch_file.id,
                    endpoint="/v1/chat/completions",
                    completion_window="24h",
                    metadata={"description": "nightly eval job"},
                )
            )
        with open(batch_id_path, "w") as f:
            for b in submitted:
                f.write(json.dumps(b.json()) + "\n")
        print(f"Submitted {len(submitted)} batch jobs. Please check back later.")

    with open(batch_id_path) as f:
        batch_ids = [json.loads(json.loads(line.strip()))["id"] for line in f]

    print("Requesting OpenAI server every 60 seconds...")
    while True:
        batches = [client.batches.retrieve(bid) for bid in batch_ids]
        statuses = [b.status for b in batches]
        print("Batches status:", statuses)
        if all(s == "completed" for s in statuses):
            break
        if any(s in ("in_progress", "validating", "finalizing") for s in statuses):
            time.sleep(60)
        else:
            print("Batch failed. They have to be either completed, in_progress, validating, or finalizing")
            return

    responses = "\n".join(client.files.content(b.output_file_id).text for b in batches)
    responses = "\n".join(line for line in responses.split("\n") if line)
    with open(return_path, "w") as f:
        f.write(responses)

    print(return_path)
    print_token_usage(responses)
    save_evaluation_result(responses, prediction_set, output_path)
    print_calculated_performance(output_path)


if __name__ == "__main__":
    main()
