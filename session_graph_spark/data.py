"""Closed vocabularies and side tables (the engine's broadcast dimensions).

Mirrors the reference's behavioral spec:
- 24-predicate closed vocabulary (reference: pipeline/triple_extraction.py:75-100,
  ontology/devkg.ttl:221-368)
- stopword + whitelist sets for the two-level garbage filters
  (reference: pipeline/triple_extraction.py:109-124, pipeline/link_entities.py:80-139)
- alias dictionary: surface form -> canonical label
  (reference: pipeline/entity_aliases.json, loaded at link_entities.py:262-277)

These are tiny dimension tables; in the pipeline they are broadcast-joined
against the mention stream (never shuffled).
"""

from __future__ import annotations

# --- 24-predicate closed vocabulary (names only; descriptions are docs) ----
PREDICATE_VOCABULARY: tuple[str, ...] = (
    "uses", "dependsOn", "enables", "isPartOf", "hasPart", "implements",
    "extends", "alternativeTo", "solves", "produces", "configures",
    "composesWith", "provides", "requires", "isTypeOf", "builtWith",
    "deployedOn", "storesIn", "queriedWith", "integratesWith",
    "broader", "narrower", "relatedTo", "servesAs",
)
FALLBACK_PREDICATE = "relatedTo"

# --- stopwords rejected before any other rule -------------------------------
STOPWORDS: frozenset[str] = frozenset({
    "command name", "exit", "yes", "no", "ok", "the", "it", "this",
    "that", "none", "null", "undefined", "true", "false", "n/a",
    "[object object]", "object object",
})

# --- known-good short tech terms that bypass all rejection rules ------------
WHITELIST: frozenset[str] = frozenset({
    "ai", "ui", "db", "os", "ip", "ci", "cd", "js", "ts", "go", "ml",
    "api", "sdk", "sql", "css", "jwt", "ssh", "ssl", "tls", "dns", "cdn",
    "gpu", "cpu", "ram", "ssd", "hdd", "cli", "gui", "ide", "nlp", "llm",
    "rag", "rdf", "owl", "uri", "url", "xml", "csv", "pdf", "svg", "png",
    "gif", "npm", "pip", "git", "aws", "gcp", "mcp", "rpa",
})

# two-char terms allowed through the 2-char-noise rule in the L2 filter
TWO_CHAR_WHITELIST: frozenset[str] = frozenset({
    "ai", "ui", "db", "os", "ip", "ci", "cd", "js", "ts", "go", "ml",
})

# --- alias dictionary: lowercase surface form -> canonical label ------------
# Same three classes as the reference file (abbreviations, tool-name
# variants, framework spelling variants); curated here, not copied.
ALIAS_MAP: dict[str, str] = {
    # abbreviations / short forms
    "js": "javascript",
    "ts": "typescript",
    "py": "python",
    "k8s": "kubernetes",
    "tf": "tensorflow",
    "gcp": "google cloud platform",
    "aws": "amazon web services",
    "ml": "machine learning",
    "ai": "artificial intelligence",
    "dl": "deep learning",
    "nlp": "natural language processing",
    "llm": "large language model",
    "llms": "large language model",
    "kg": "knowledge graph",
    "rag": "retrieval augmented generation",
    "otel": "opentelemetry",
    "otlp": "opentelemetry",
    "ssh": "secure shell",
    "csv": "comma-separated values",
    "db": "database",
    "pg": "postgresql",
    "es": "elasticsearch",
    "gh": "github",
    # tool-name variants
    "vscode": "visual studio code",
    "vs code": "visual studio code",
    "warp": "warp terminal",
    "warp terminal": "warp terminal",
    "claude code": "claude code",
    "chatgpt": "chatgpt",
    # framework / library spelling variants
    "react.js": "react",
    "reactjs": "react",
    "node.js": "node.js",
    "nodejs": "node.js",
    "node": "node.js",
    "nextjs": "next.js",
    "next.js": "next.js",
    "vue.js": "vue.js",
    "vuejs": "vue.js",
    "vue": "vue.js",
    "postgres": "postgresql",
    "postgresql": "postgresql",
    "k8": "kubernetes",
    "kube": "kubernetes",
    "kubernetes": "kubernetes",
    "docker compose": "docker compose",
    "docker-compose": "docker compose",
    "golang": "go",
    "py torch": "pytorch",
    "torch": "pytorch",
    "sklearn": "scikit-learn",
    "scikit learn": "scikit-learn",
    "fast api": "fastapi",
    "fastapi": "fastapi",
    "sqlalchemy": "sqlalchemy",
    "sql alchemy": "sqlalchemy",
    "mongo": "mongodb",
    "mongodb": "mongodb",
    "redis": "redis",
    "rabbitmq": "rabbitmq",
    "rabbit mq": "rabbitmq",
    "pyspark": "apache spark",
    "spark": "apache spark",
    "apache spark": "apache spark",
    "kafka": "apache kafka",
    "apache kafka": "apache kafka",
    "airflow": "apache airflow",
    "iceberg": "apache iceberg",
    "apache iceberg": "apache iceberg",
    # --- round-2 expansion toward reference coverage (161 entries) ------
    # cloud / infra abbreviations
    "ec2": "amazon ec2",
    "s3": "amazon s3",
    "rds": "amazon rds",
    "eks": "amazon eks",
    "gke": "google kubernetes engine",
    "aks": "azure kubernetes service",
    "aws lambda": "aws lambda",
    "fargate": "aws fargate",
    "cloudformation": "aws cloudformation",
    "iam": "identity and access management",
    "vpc": "virtual private cloud",
    "sso": "single sign-on",
    "jwt": "json web token",
    "tls": "transport layer security",
    "ssl": "transport layer security",
    "oauth2": "oauth",
    "oauth 2.0": "oauth",
    "cicd": "continuous integration",
    "ci/cd": "continuous integration",
    # editors / dev tools
    "vsc": "visual studio code",
    "pycharm": "pycharm",
    "intellij idea": "intellij",
    "neovim": "neovim",
    "nvim": "neovim",
    "vim": "vim",
    "emacs": "emacs",
    "jupyter": "jupyter",
    "jupyter notebook": "jupyter",
    "jupyterlab": "jupyter",
    "github actions": "github actions",
    "gh actions": "github actions",
    "gitlab ci": "gitlab ci",
    "circleci": "circleci",
    "argocd": "argocd",
    "argo cd": "argocd",
    "helm": "helm",
    "istio": "istio",
    "envoy": "envoy",
    "etcd": "etcd",
    "consul": "consul",
    "hashicorp vault": "hashicorp vault",
    "pulumi": "pulumi",
    # frameworks / libraries
    "angular": "angular",
    "angularjs": "angular",
    "angular.js": "angular",
    "svelte": "svelte",
    "sveltekit": "svelte",
    "express.js": "express",
    "expressjs": "express",
    "nestjs": "nestjs",
    "nest.js": "nestjs",
    "spring boot": "spring boot",
    "springboot": "spring boot",
    "ruby on rails": "ruby on rails",
    "rails": "ruby on rails",
    "ror": "ruby on rails",
    "laravel": "laravel",
    ".net": ".net",
    "dotnet": ".net",
    "asp.net": ".net",
    "numpy": "numpy",
    "matplotlib": "matplotlib",
    "tailwindcss": "tailwind",
    "tailwind css": "tailwind",
    "bootstrap": "bootstrap",
    "jquery": "jquery",
    "three.js": "three.js",
    "threejs": "three.js",
    "d3.js": "d3",
    "d3js": "d3",
    "huggingface": "huggingface",
    "hugging face": "huggingface",
    "langchain": "langchain",
    "stable diffusion": "stable diffusion",
    # databases / data systems
    "sql server": "sql server",
    "sqlserver": "sql server",
    "mssql": "sql server",
    "mariadb": "mariadb",
    "cockroachdb": "cockroachdb",
    "dynamodb": "dynamodb",
    "cassandra": "apache cassandra",
    "apache cassandra": "apache cassandra",
    "clickhouse": "clickhouse",
    "duckdb": "duckdb",
    "duck db": "duckdb",
    "snowflake": "snowflake",
    "bigquery": "google bigquery",
    "google bigquery": "google bigquery",
    "redshift": "amazon redshift",
    "memcached": "memcached",
    "zookeeper": "apache zookeeper",
    "apache zookeeper": "apache zookeeper",
    "flink": "apache flink",
    "apache flink": "apache flink",
    "apache beam": "apache beam",
    "hadoop": "apache hadoop",
    "apache hadoop": "apache hadoop",
    "hdfs": "apache hadoop",
    "hive": "apache hive",
    "apache hive": "apache hive",
    "trino": "trino",
    "presto": "trino",
    "delta lake": "delta lake",
    "deltalake": "delta lake",
    "apache parquet": "apache parquet",
    "parquet": "apache parquet",
    "apache arrow": "apache arrow",
    "pyarrow": "apache arrow",
    "avro": "apache avro",
    # concepts
    "cnn": "convolutional neural network",
    "rnn": "recurrent neural network",
    "gan": "generative adversarial network",
    "etl": "extract transform load",
    "olap": "online analytical processing",
    "oltp": "online transaction processing",
    "orm": "object-relational mapping",
    "mvc": "model-view-controller",
    "tdd": "test-driven development",
    "grpc": "grpc",
    "rpc": "remote procedure call",
}


def alias_rows() -> list[tuple[str, str]]:
    """(surface, canonical) rows for the broadcast alias DataFrame."""
    return sorted(ALIAS_MAP.items())


def predicate_rows() -> list[tuple[str]]:
    return [(p,) for p in PREDICATE_VOCABULARY]
