"""LLM-judge scoring via per-request async calls (parity: reference
``scripts/eval_gpt.py`` — the non-Batch-API variant, useful for small runs and
providers without batch endpoints). Shares the judge prompt contract with
``eval_gpt_batch.py``; handles content-filter refusals as (no, 0).
"""

from __future__ import annotations



import argparse
import ast
import asyncio
import json
import os
from typing import Dict

from scripts.eval_gpt_batch import (
    JUDGE_MODEL,
    JUDGE_SYSTEM,
    judge_user_prompt,
    print_calculated_performance,
)


async def judge_one(client, sem: asyncio.Semaphore, key: str, qa: Dict[str, str]) -> Dict:
    async with sem:
        try:
            resp = await client.chat.completions.create(
                model=JUDGE_MODEL,
                messages=[
                    {"role": "system", "content": JUDGE_SYSTEM},
                    {"role": "user", "content": judge_user_prompt(qa["q"], qa["a"], qa["pred"])},
                ],
                max_tokens=500,
            )
            if resp.choices[0].finish_reason == "content_filter":
                return {"pred": "no", "score": 0}
            prediction = ast.literal_eval(resp.choices[0].message.content)
            assert "pred" in prediction and "score" in prediction
            return prediction
        except Exception:
            return {"pred": "no", "score": 0}


async def run(prediction_set: Dict[str, Dict[str, str]], concurrency: int = 16) -> Dict[str, Dict]:
    import openai

    with open(".openai_key") as f:
        client = openai.AsyncOpenAI(api_key=f.read().strip())
    sem = asyncio.Semaphore(concurrency)
    keys = list(prediction_set.keys())
    results = await asyncio.gather(*(judge_one(client, sem, k, prediction_set[k]) for k in keys))
    return dict(zip(keys, results))


def main() -> None:
    parser = argparse.ArgumentParser(description="question-answer-generation-using-gpt (async)")
    parser.add_argument("--ckpt_name", default="")
    parser.add_argument("--benchmark", default="")
    parser.add_argument("--concurrency", type=int, default=16)
    args = parser.parse_args()

    pred_path = f"eval_result/{args.ckpt_name}/{args.benchmark}_pred_merge.jsonl"
    output_path = f"eval_result/{args.ckpt_name}/{args.benchmark}_gpt.json"

    if os.path.exists(output_path):
        print("File", output_path, "already exists. Evaluation was already done!")
        print_calculated_performance(output_path)
        return
    if not os.path.exists(pred_path):
        print("File", pred_path, "does not exist")
        return

    with open(pred_path) as f:
        preds = [json.loads(line) for line in f if line.strip()]
    prediction_set = {
        s["question_id"]: {"q": s["question"], "a": s["answer"], "pred": s["pred"]} for s in preds
    }

    judged = asyncio.run(run(prediction_set, args.concurrency))
    merged = {k: [judged.get(k, {"pred": "no", "score": 0}), v] for k, v in prediction_set.items()}
    with open(output_path, "w") as f:
        json.dump(merged, f)
    print_calculated_performance(output_path)


if __name__ == "__main__":
    main()
