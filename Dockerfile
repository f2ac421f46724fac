# Container packaging — the Spark-native counterpart of the reference's
# Dockerfile (python:3.10-slim + requirements.txt + `CMD run_pipeline.py`).
# Differences are engine-driven: PySpark needs a JRE, and the default
# command is the packaged CLI running on all local cores. On a real cluster
# this image is the driver/executor base for spark-submit on YARN/K8s; the
# CMD below is the single-node path.

FROM python:3.11-slim

ENV PYTHONDONTWRITEBYTECODE=1 \
    PYTHONUNBUFFERED=1 \
    JAVA_HOME=/usr/lib/jvm/default-java

# PySpark's only system dependency is a Java 17+ runtime (headless).
RUN apt-get update && apt-get install -y --no-install-recommends \
    default-jre-headless \
    && rm -rf /var/lib/apt/lists/* \
    && ln -sfn "$(dirname "$(dirname "$(readlink -f "$(command -v java)")")")" \
       /usr/lib/jvm/default-java

WORKDIR /app

# Install the package (dependency list lives in pyproject.toml; add
# `.[parity]` for the transformers/langdetect/matplotlib backends).
COPY pyproject.toml README.md ./
COPY llm_pretraining_data_pipeline_spark ./llm_pretraining_data_pipeline_spark
RUN pip install --no-cache-dir .

# Vendor-fetch the two public GPT-2 asset files (vocabulary is LEARNED
# data — it cannot be regenerated programmatically) so the "auto"
# tokenizer backend produces exact published ids out of the box. The
# fetch is best-effort: an air-gapped build still succeeds and falls
# back to the committed byte-level subset + regex stand-in (the runbook
# in scripts/fetch_gpt2_assets.py covers the manual drop-in).
COPY scripts/fetch_gpt2_assets.py ./scripts/fetch_gpt2_assets.py
RUN python scripts/fetch_gpt2_assets.py --dest /app/gpt2_assets \
    || echo "WARN: no network at build time — tokenizer runs on the" \
            "committed subset assets; see scripts/fetch_gpt2_assets.py"
ENV SPARK_GRAFT_GPT2_ASSETS=/app/gpt2_assets

ENTRYPOINT ["llm-pipeline-spark"]
CMD ["--help"]
