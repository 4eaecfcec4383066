"""Entity linking against a knowledge-base dimension (the reference's
headline feature, re-expressed without external APIs).

The reference links each resolved entity label to a Wikidata QID with a
confidence ladder (link_entities.py:517-545): exact label match -> 1.0,
tech keyword in the candidate's description -> 0.8, else 0.5; links below
CONFIDENCE_THRESHOLD = 0.7 (link_entities.py:57) are rejected, and every
decision — including "searched, not found" — is cached so re-runs never
re-query (negative caching, link_entities.py:295-311). Output is an
owl:sameAs-style edge table.

Context-aware disambiguation (reference link_entities.py:437-493 builds a
per-entity triple context; :653-663 feeds it to the linker, whose
select_best_match priority is exact > alias > tech keyword > first,
agentic_linker_langgraph.py:204 passes "Entity: X / Context: ...").
Deterministic analog here: when a `context` DataFrame (label ->
array<string> of co-occurring entity labels) is supplied, candidates at
the SAME ladder rung are re-ranked by evidence before the kb_id
tie-break:
  - domain agreement (+2): the context contains a known tech entity
    (any term matches a KB label/alias whose description carries a tech
    keyword) and the candidate is the tech sense — or the context is
    known and non-tech and the candidate is the non-tech sense;
  - keyword overlap (+0..3): words shared between the context terms and
    the candidate's description.
The ladder confidence itself is unchanged (rung semantics stay the
reference's); context only decides BETWEEN same-confidence senses, so
"go" in a kubernetes/python conversation resolves to the programming
language while "go" next to "board game" terms resolves to the game.

Here the Wikidata search is replaced by a deterministic gazetteer
dimension table (kb_id, label, description, aliases): candidate
generation is a broadcast join on exact label OR alias. Everything is
DataFrame joins — no UDFs, no driver loops; the KB is a broadcast dim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

CONFIDENCE_THRESHOLD = 0.7  # reference link_entities.py:57

# reference TECH_KEYWORDS (link_entities.py:64-69): description terms that
# mark a candidate as a technology sense of an ambiguous label
TECH_KEYWORDS: tuple[str, ...] = (
    "software", "database", "framework", "library", "programming",
    "language", "tool", "platform", "application", "system",
    "service", "api", "protocol", "standard", "specification",
    "technology", "infrastructure", "container", "orchestration",
)

# Deterministic gazetteer: (kb_id, label, description, aliases).
# Curated for this engine (kb: ids are synthetic); descriptions decide the
# 0.8 rung exactly like Wikidata descriptions do in the reference. The
# reference links against a 4,774-entity slice of Wikidata (README.md:
# 52-53); this dimension carries the same decision machinery at gazetteer
# scale. IMPORTANT invariants (the oracle SQL inlines these as VALUES):
# no apostrophes anywhere; labels/aliases lowercase; for ambiguous labels
# the default (context-free) winner must be the LOWEST kb_id, so non-tech
# alternative senses always get HIGHER ids than their tech twin — with
# ONE deliberate inversion: 'mercury' (deity kb:0051 < language kb:0209)
# exercises the opposite re-rank direction, where the context-free pick
# is the NON-tech sense and tech context evidence must flip it.
KB_ENTRIES: tuple[tuple[str, str, str, tuple[str, ...]], ...] = (
    ("kb:0001", "python", "high-level programming language", ("py", "cpython")),
    ("kb:0002", "javascript", "programming language of the web", ("js", "ecmascript")),
    ("kb:0003", "typescript", "typed superset programming language", ("ts",)),
    ("kb:0004", "go", "compiled programming language", ("golang",)),
    ("kb:0005", "rust", "memory-safe systems programming language", ()),
    ("kb:0006", "kubernetes", "container orchestration platform", ("k8s", "kube")),
    ("kb:0007", "docker", "container runtime and packaging tool", ()),
    ("kb:0008", "postgresql", "relational database system", ("postgres", "pg")),
    ("kb:0009", "mysql", "relational database system", ()),
    ("kb:0010", "sqlite", "embedded relational database library", ()),
    ("kb:0011", "mongodb", "document database", ("mongo",)),
    ("kb:0012", "redis", "in-memory key-value database", ()),
    ("kb:0013", "elasticsearch", "distributed search and analytics engine", ("es",)),
    ("kb:0014", "neo4j", "graph database", ()),
    ("kb:0015", "apache spark", "distributed data processing framework", ("spark", "pyspark")),
    ("kb:0016", "apache kafka", "distributed event streaming platform", ("kafka",)),
    ("kb:0017", "apache airflow", "workflow orchestration platform", ("airflow",)),
    ("kb:0018", "apache iceberg", "open table format specification", ("iceberg",)),
    ("kb:0019", "react", "user interface library", ("react.js", "reactjs")),
    ("kb:0020", "node.js", "javascript runtime system", ("node", "nodejs")),
    ("kb:0021", "next.js", "react web framework", ("nextjs",)),
    ("kb:0022", "vue.js", "user interface framework", ("vue", "vuejs")),
    ("kb:0023", "django", "python web framework", ()),
    ("kb:0024", "fastapi", "python web framework", ("fast api",)),
    ("kb:0025", "flask", "python web framework", ()),
    ("kb:0026", "pytorch", "machine learning framework", ("torch",)),
    ("kb:0027", "tensorflow", "machine learning framework", ("tf",)),
    ("kb:0028", "scikit-learn", "machine learning library", ("sklearn",)),
    ("kb:0029", "pandas", "data analysis library", ()),
    ("kb:0030", "numpy", "numerical computing library", ()),
    ("kb:0031", "git", "version control tool", ()),
    ("kb:0032", "github", "code hosting platform", ("gh",)),
    ("kb:0033", "gitlab", "devops platform", ()),
    ("kb:0034", "terraform", "infrastructure as code tool", ()),
    ("kb:0035", "ansible", "configuration management tool", ()),
    ("kb:0036", "prometheus", "monitoring system", ()),
    ("kb:0037", "grafana", "observability dashboard platform", ()),
    ("kb:0038", "opentelemetry", "observability instrumentation standard", ("otel", "otlp")),
    ("kb:0039", "rabbitmq", "message broker service", ("rabbit mq",)),
    ("kb:0040", "nginx", "web server and reverse proxy", ()),
    ("kb:0041", "graphql", "query language and api specification", ()),
    ("kb:0042", "grpc", "remote procedure call protocol", ()),
    ("kb:0043", "amazon web services", "cloud computing platform", ("aws",)),
    ("kb:0044", "google cloud platform", "cloud computing platform", ("gcp",)),
    ("kb:0045", "azure", "cloud computing platform", ()),
    ("kb:0046", "linux", "operating system kernel", ()),
    ("kb:0047", "backend", "server-side part of an application", ()),
    ("kb:0048", "frontend", "client-side part of an application", ()),
    ("kb:0049", "agent", "autonomous acting entity", ()),
    ("kb:0050", "api", "application programming interface", ("apis",)),
    # non-tech sense reachable only via alias: exercises the 0.5 rung
    # (below threshold -> candidate found but NOT linked). "quicksilver"
    # is the corpus plant for the below-threshold metrics path.
    ("kb:0051", "mercury", "roman deity and first planet", ("hg", "quicksilver")),
    # ---- round-3 expansion: languages -----------------------------------
    ("kb:0052", "java", "object-oriented programming language", ("jvm language",)),
    ("kb:0053", "c", "low-level systems programming language", ()),
    ("kb:0054", "c++", "general purpose systems programming language", ("cpp",)),
    ("kb:0055", "c#", "object-oriented programming language", ("csharp",)),
    ("kb:0056", "ruby", "dynamic programming language", ()),
    ("kb:0057", "swift", "compiled programming language for apple devices", ()),
    ("kb:0058", "kotlin", "statically typed programming language", ()),
    ("kb:0059", "scala", "functional and object-oriented programming language", ()),
    ("kb:0060", "php", "server-side scripting language", ()),
    ("kb:0061", "perl", "text processing scripting language", ()),
    ("kb:0062", "haskell", "purely functional programming language", ()),
    ("kb:0063", "elixir", "functional programming language on the beam", ()),
    ("kb:0064", "erlang", "concurrent programming language", ()),
    ("kb:0065", "clojure", "lisp dialect programming language", ()),
    ("kb:0066", "lua", "embeddable scripting language", ()),
    ("kb:0067", "julia", "numerical computing programming language", ()),
    ("kb:0068", "dart", "client-optimized programming language", ()),
    ("kb:0069", "zig", "low-level systems programming language", ()),
    ("kb:0070", "ocaml", "functional programming language", ()),
    ("kb:0071", "fortran", "numeric scientific programming language", ()),
    ("kb:0072", "cobol", "business-oriented programming language", ()),
    ("kb:0073", "groovy", "jvm scripting language", ()),
    ("kb:0074", "matlab", "numeric computing language and platform", ()),
    ("kb:0075", "bash", "unix shell and command language", ()),
    ("kb:0076", "powershell", "task automation shell and language", ()),
    ("kb:0077", "solidity", "smart contract programming language", ()),
    ("kb:0078", "nim", "statically typed compiled language", ()),
    ("kb:0079", "crystal", "compiled language with ruby-like syntax", ()),
    ("kb:0080", "scheme", "minimalist lisp programming language", ()),
    ("kb:0081", "prolog", "logic programming language", ()),
    ("kb:0082", "webassembly", "portable binary instruction format standard", ("wasm",)),
    ("kb:0083", "mercurial", "distributed version control tool", ()),
    # ---- web / ui frameworks and libraries ------------------------------
    ("kb:0084", "angular", "web application framework", ("angularjs", "angular.js")),
    ("kb:0085", "svelte", "compiler-based user interface framework", ("sveltekit",)),
    ("kb:0086", "express", "node.js web framework", ("express.js", "expressjs")),
    ("kb:0087", "nestjs", "node.js server-side framework", ("nest.js",)),
    ("kb:0088", "spring boot", "java application framework", ("springboot", "spring")),
    ("kb:0089", "ruby on rails", "ruby web framework", ("rails", "ror")),
    ("kb:0090", "laravel", "php web framework", ()),
    ("kb:0091", "symfony", "php web framework", ()),
    ("kb:0092", ".net", "software development framework", ("dotnet", "asp.net")),
    ("kb:0093", "gin", "go web framework", ()),
    ("kb:0094", "actix", "rust actor web framework", ()),
    ("kb:0095", "axum", "rust web framework", ()),
    ("kb:0096", "tokio", "rust asynchronous runtime library", ()),
    ("kb:0097", "jquery", "dom manipulation library", ()),
    ("kb:0098", "lodash", "javascript utility library", ()),
    ("kb:0099", "axios", "http client library", ()),
    ("kb:0100", "webpack", "javascript module bundler tool", ()),
    ("kb:0101", "vite", "frontend build tool", ()),
    ("kb:0102", "rollup", "javascript module bundler tool", ()),
    ("kb:0103", "esbuild", "javascript bundler and minifier tool", ()),
    ("kb:0104", "babel", "javascript compiler tool", ()),
    ("kb:0105", "eslint", "javascript linting tool", ()),
    ("kb:0106", "prettier", "code formatting tool", ()),
    ("kb:0107", "jest", "javascript testing framework", ()),
    ("kb:0108", "mocha", "javascript test framework", ()),
    ("kb:0109", "cypress", "end-to-end testing framework", ()),
    ("kb:0110", "playwright", "browser automation library", ()),
    ("kb:0111", "puppeteer", "headless browser automation library", ()),
    ("kb:0112", "storybook", "ui component development tool", ()),
    ("kb:0113", "tailwind", "utility-first css framework", ("tailwindcss", "tailwind css")),
    ("kb:0114", "bootstrap", "css component framework", ()),
    ("kb:0115", "material ui", "react component library", ("mui",)),
    ("kb:0116", "chakra ui", "react component library", ()),
    ("kb:0117", "redux", "state management library", ()),
    ("kb:0118", "mobx", "reactive state management library", ()),
    ("kb:0119", "zustand", "minimal state management library", ()),
    ("kb:0120", "rxjs", "reactive extensions library", ()),
    ("kb:0121", "electron", "desktop application framework", ()),
    ("kb:0122", "tauri", "desktop application framework", ()),
    ("kb:0123", "flutter", "cross-platform ui framework", ()),
    ("kb:0124", "react native", "cross-platform mobile framework", ()),
    ("kb:0125", "expo", "react native development platform", ()),
    ("kb:0126", "ionic", "hybrid mobile app framework", ()),
    ("kb:0127", "three.js", "3d graphics library", ("threejs",)),
    ("kb:0128", "d3", "data visualization library", ("d3.js", "d3js")),
    ("kb:0129", "chart.js", "charting library", ("chartjs",)),
    ("kb:0130", "leaflet", "interactive map library", ()),
    # ---- python ecosystem ------------------------------------------------
    ("kb:0131", "sqlalchemy", "python sql toolkit and orm library", ("sql alchemy",)),
    ("kb:0132", "alembic", "database migration tool", ()),
    ("kb:0133", "pydantic", "python data validation library", ()),
    ("kb:0134", "pytest", "python testing framework", ()),
    ("kb:0135", "hypothesis", "property-based testing library", ()),
    ("kb:0136", "celery", "distributed task queue library", ()),
    ("kb:0137", "requests", "python http library", ()),
    ("kb:0138", "httpx", "asynchronous python http library", ()),
    ("kb:0139", "aiohttp", "asynchronous http framework", ()),
    ("kb:0140", "boto3", "aws sdk library for python", ()),
    ("kb:0141", "jinja2", "template engine library", ("jinja",)),
    ("kb:0142", "streamlit", "data app framework", ()),
    ("kb:0143", "gradio", "machine learning demo framework", ()),
    ("kb:0144", "plotly", "interactive graphing library", ()),
    ("kb:0145", "matplotlib", "python plotting library", ()),
    ("kb:0146", "seaborn", "statistical visualization library", ()),
    ("kb:0147", "bokeh", "interactive visualization library", ()),
    ("kb:0148", "scipy", "scientific computing library", ()),
    ("kb:0149", "statsmodels", "statistical modeling library", ()),
    ("kb:0150", "xgboost", "gradient boosting library", ()),
    ("kb:0151", "lightgbm", "gradient boosting framework", ()),
    ("kb:0152", "catboost", "gradient boosting library", ()),
    ("kb:0153", "keras", "deep learning api library", ()),
    ("kb:0154", "jax", "numerical computing and autograd library", ()),
    ("kb:0155", "transformers", "pretrained model library", ()),
    ("kb:0156", "spacy", "natural language processing library", ()),
    ("kb:0157", "nltk", "natural language toolkit library", ()),
    ("kb:0158", "gensim", "topic modeling library", ()),
    ("kb:0159", "opencv", "computer vision library", ("cv2",)),
    ("kb:0160", "pillow", "python imaging library", ("pil",)),
    ("kb:0161", "ffmpeg", "multimedia processing tool", ()),
    ("kb:0162", "librosa", "audio analysis library", ()),
    ("kb:0163", "poetry", "python dependency management tool", ()),
    ("kb:0164", "conda", "package and environment management tool", ()),
    ("kb:0165", "virtualenv", "python environment isolation tool", ("venv",)),
    ("kb:0166", "pyenv", "python version management tool", ()),
    # ---- databases / data systems ----------------------------------------
    ("kb:0167", "mariadb", "relational database system", ()),
    ("kb:0168", "oracle database", "relational database system", ()),
    ("kb:0169", "sql server", "relational database system", ("sqlserver", "mssql")),
    ("kb:0170", "cockroachdb", "distributed sql database", ()),
    ("kb:0171", "dynamodb", "managed nosql database service", ()),
    ("kb:0172", "apache cassandra", "wide-column nosql database", ("cassandra",)),
    ("kb:0173", "clickhouse", "columnar analytics database", ()),
    ("kb:0174", "duckdb", "in-process analytical database", ("duck db",)),
    ("kb:0175", "snowflake", "cloud data warehouse platform", ()),
    ("kb:0176", "google bigquery", "serverless data warehouse service", ("bigquery",)),
    ("kb:0177", "amazon redshift", "cloud data warehouse service", ("redshift",)),
    ("kb:0178", "databricks", "data and ai platform", ()),
    ("kb:0179", "memcached", "in-memory caching system", ()),
    ("kb:0180", "apache zookeeper", "distributed coordination service", ("zookeeper",)),
    ("kb:0181", "apache flink", "stream processing framework", ("flink",)),
    ("kb:0182", "apache beam", "unified batch and stream processing framework", ()),
    ("kb:0183", "apache hadoop", "distributed storage and processing framework", ("hadoop", "hdfs")),
    ("kb:0184", "apache hive", "data warehouse software", ("hive",)),
    ("kb:0185", "trino", "distributed sql query engine", ("presto",)),
    ("kb:0186", "delta lake", "open table format storage framework", ("deltalake",)),
    ("kb:0187", "apache parquet", "columnar storage file format specification", ("parquet",)),
    ("kb:0188", "apache arrow", "in-memory columnar data format specification", ("pyarrow",)),
    ("kb:0189", "apache avro", "row-oriented data serialization format specification", ("avro",)),
    ("kb:0190", "apache orc", "columnar storage file format specification", ("orc",)),
    ("kb:0191", "apache hudi", "incremental data lake table format framework", ("hudi",)),
    ("kb:0192", "apache druid", "real-time analytics database", ("druid",)),
    ("kb:0193", "apache pinot", "real-time distributed olap database", ()),
    ("kb:0194", "apache superset", "data exploration and visualization platform", ("superset",)),
    ("kb:0195", "dbt", "data transformation tool", ()),
    ("kb:0196", "airbyte", "data integration platform", ()),
    ("kb:0197", "apache nifi", "dataflow automation tool", ("nifi",)),
    ("kb:0198", "influxdb", "time series database", ()),
    ("kb:0199", "timescaledb", "time series relational database", ()),
    ("kb:0200", "scylladb", "wide-column nosql database", ("scylla",)),
    ("kb:0201", "couchdb", "document-oriented nosql database", ()),
    ("kb:0202", "couchbase", "distributed nosql database", ()),
    ("kb:0203", "etcd", "distributed key-value store system", ()),
    # ---- ambiguous non-tech senses (context-disambiguation targets) -----
    # Each shares an exact label with a LOWER-id tech entry, so the
    # context-free tie-break keeps today's winners; context evidence can
    # flip the choice (reference 7-case spot check,
    # agentic_linker_langgraph.py:234-291). Exception in this block:
    # kb:0209 'mercury' is the TECH sense and its twin kb:0051 (deity) has
    # the lower id — the deliberate inverted case, so the suite covers
    # both re-rank directions (tech->non-tech and non-tech->tech).
    ("kb:0204", "go", "abstract strategy board game from east asia", ("baduk",)),
    ("kb:0205", "python", "large constricting snake genus", ()),
    ("kb:0206", "java", "island of indonesia", ()),
    ("kb:0207", "ruby", "red gemstone corundum variety", ()),
    ("kb:0208", "swift", "fast-flying aerial bird", ()),
    ("kb:0209", "mercury", "purely declarative logic programming language", ()),
    ("kb:0210", "agent", "software process acting autonomously for a user", ()),
    ("kb:0211", "rust", "iron oxide corrosion on metal", ()),
    ("kb:0212", "crystal", "solid with an ordered microscopic structure", ()),
    # ---- vector / search infrastructure ----------------------------------
    ("kb:0213", "minio", "object storage system", ()),
    ("kb:0214", "ceph", "distributed storage system", ()),
    ("kb:0215", "weaviate", "vector database", ()),
    ("kb:0216", "qdrant", "vector similarity search database", ()),
    ("kb:0217", "milvus", "vector database", ()),
    ("kb:0218", "pinecone", "managed vector database service", ()),
    ("kb:0219", "chroma", "embedding database", ("chromadb",)),
    ("kb:0220", "faiss", "similarity search library", ()),
    ("kb:0221", "annoy", "approximate nearest neighbor library", ()),
    ("kb:0222", "hnswlib", "graph-based nearest neighbor library", ()),
    ("kb:0223", "lancedb", "embedded vector database", ()),
    ("kb:0224", "rocksdb", "embeddable key-value store library", ()),
    ("kb:0225", "leveldb", "key-value storage library", ()),
    ("kb:0226", "supabase", "open source backend platform", ()),
    ("kb:0227", "firebase", "app development platform", ()),
    ("kb:0228", "planetscale", "serverless mysql platform", ()),
    ("kb:0229", "vitess", "database clustering system for mysql", ()),
    ("kb:0230", "debezium", "change data capture platform", ()),
    # ---- cloud / infra / devops ------------------------------------------
    ("kb:0231", "amazon s3", "object storage service", ("s3",)),
    ("kb:0232", "amazon ec2", "virtual server compute service", ("ec2",)),
    ("kb:0233", "amazon rds", "managed relational database service", ("rds",)),
    ("kb:0234", "aws lambda", "serverless compute service", ()),
    ("kb:0235", "amazon eks", "managed kubernetes service", ("eks",)),
    ("kb:0236", "google kubernetes engine", "managed kubernetes service", ("gke",)),
    ("kb:0237", "azure kubernetes service", "managed kubernetes service", ("aks",)),
    ("kb:0238", "aws fargate", "serverless container compute service", ("fargate",)),
    ("kb:0239", "aws cloudformation", "infrastructure as code service", ("cloudformation",)),
    ("kb:0240", "cloudflare", "content delivery and security platform", ()),
    ("kb:0241", "vercel", "frontend deployment platform", ()),
    ("kb:0242", "netlify", "web deployment platform", ()),
    ("kb:0243", "heroku", "application hosting platform", ()),
    ("kb:0244", "digitalocean", "cloud hosting platform", ()),
    ("kb:0245", "fly.io", "application deployment platform", ()),
    ("kb:0246", "docker compose", "multi-container orchestration tool", ("docker-compose",)),
    ("kb:0247", "podman", "daemonless container engine tool", ()),
    ("kb:0248", "containerd", "container runtime system", ()),
    ("kb:0249", "helm", "kubernetes package manager tool", ()),
    ("kb:0250", "istio", "service mesh platform", ()),
    ("kb:0251", "envoy", "edge and service proxy software", ()),
    ("kb:0252", "linkerd", "lightweight service mesh software", ()),
    ("kb:0253", "consul", "service discovery and configuration system", ()),
    ("kb:0254", "hashicorp vault", "secrets management tool", ()),
    ("kb:0255", "nomad", "workload orchestration tool", ()),
    ("kb:0256", "packer", "machine image build tool", ()),
    ("kb:0257", "vagrant", "development environment management tool", ()),
    ("kb:0258", "jenkins", "automation server software", ()),
    ("kb:0259", "circleci", "continuous integration platform", ()),
    ("kb:0260", "github actions", "workflow automation service", ("gh actions",)),
    ("kb:0261", "gitlab ci", "continuous integration service", ()),
    ("kb:0262", "argocd", "declarative gitops delivery tool", ("argo cd",)),
    ("kb:0263", "flux", "gitops continuous delivery tool", ()),
    ("kb:0264", "tekton", "cloud native ci/cd framework", ()),
    ("kb:0265", "bazel", "build and test tool", ()),
    ("kb:0266", "gradle", "build automation tool", ()),
    ("kb:0267", "maven", "build automation tool for java", ()),
    ("kb:0268", "cmake", "cross-platform build system generator tool", ()),
    ("kb:0269", "pulumi", "infrastructure as code platform", ()),
    ("kb:0270", "crossplane", "control plane framework", ()),
    ("kb:0271", "qemu", "machine emulator and virtualizer software", ()),
    ("kb:0272", "wireguard", "vpn tunnel protocol", ()),
    ("kb:0273", "tailscale", "mesh vpn service", ()),
    ("kb:0274", "caddy", "web server with automatic https software", ()),
    ("kb:0275", "traefik", "cloud native reverse proxy software", ()),
    ("kb:0276", "haproxy", "load balancing proxy software", ()),
    ("kb:0277", "apache httpd", "web server software", ("httpd",)),
    ("kb:0278", "tomcat", "java servlet container server", ()),
    ("kb:0279", "gunicorn", "python wsgi http server software", ()),
    ("kb:0280", "uvicorn", "python asgi server software", ()),
    ("kb:0281", "systemd", "system and service manager software", ()),
    ("kb:0282", "kustomize", "kubernetes configuration customization tool", ()),
    ("kb:0283", "minikube", "local kubernetes tool", ()),
    ("kb:0284", "k3s", "lightweight kubernetes distribution platform", ()),
    ("kb:0285", "rancher", "kubernetes management platform", ()),
    ("kb:0286", "openshift", "enterprise kubernetes platform", ()),
    ("kb:0287", "datadog", "monitoring and analytics platform", ()),
    ("kb:0288", "sentry", "error tracking platform", ()),
    ("kb:0289", "splunk", "log analysis platform", ()),
    ("kb:0290", "logstash", "log processing pipeline tool", ()),
    ("kb:0291", "kibana", "data visualization dashboard software", ()),
    ("kb:0292", "fluentd", "log collection software", ()),
    ("kb:0293", "loki", "log aggregation system", ()),
    ("kb:0294", "jaeger", "distributed tracing system", ()),
    ("kb:0295", "zipkin", "distributed tracing system", ()),
    ("kb:0296", "thanos", "highly available prometheus system", ()),
    # ---- protocols / formats / standards ---------------------------------
    ("kb:0297", "http", "hypertext transfer protocol", ("https",)),
    ("kb:0298", "websocket", "full-duplex communication protocol", ("websockets",)),
    ("kb:0299", "webrtc", "real-time communication standard", ()),
    ("kb:0300", "mqtt", "lightweight messaging protocol", ()),
    ("kb:0301", "amqp", "message queuing protocol", ()),
    ("kb:0302", "tcp", "transmission control protocol", ()),
    ("kb:0303", "udp", "user datagram protocol", ()),
    ("kb:0304", "quic", "multiplexed transport protocol", ()),
    ("kb:0305", "dns", "domain name system", ()),
    ("kb:0306", "transport layer security", "cryptographic network protocol", ("tls", "ssl")),
    ("kb:0307", "oauth", "authorization protocol", ("oauth2", "oauth 2.0")),
    ("kb:0308", "openid connect", "identity layer protocol", ("oidc",)),
    ("kb:0309", "saml", "security assertion markup language standard", ()),
    ("kb:0310", "json web token", "compact token format standard", ("jwt",)),
    ("kb:0311", "rest", "representational state transfer api style", ()),
    ("kb:0312", "soap", "xml messaging protocol", ()),
    ("kb:0313", "json", "lightweight data interchange format standard", ()),
    ("kb:0314", "yaml", "human-readable data serialization standard", ()),
    ("kb:0315", "toml", "configuration file format specification", ()),
    ("kb:0316", "xml", "extensible markup language standard", ()),
    ("kb:0317", "protobuf", "binary serialization format specification", ("protocol buffers",)),
    ("kb:0318", "flatbuffers", "zero-copy serialization library", ()),
    ("kb:0319", "msgpack", "binary serialization format specification", ("messagepack",)),
    ("kb:0320", "markdown", "lightweight markup language", ()),
    ("kb:0321", "latex", "document preparation system", ()),
    ("kb:0322", "regular expression", "text pattern matching language", ("regex", "regexp")),
    ("kb:0323", "unicode", "character encoding standard", ("utf-8", "utf8")),
    ("kb:0324", "base64", "binary-to-text encoding standard", ()),
    ("kb:0325", "secure shell", "encrypted remote access protocol", ()),
    ("kb:0326", "sftp", "secure file transfer protocol", ()),
    ("kb:0327", "smtp", "mail transfer protocol", ()),
    ("kb:0328", "imap", "mail access protocol", ()),
    ("kb:0329", "ldap", "directory access protocol", ()),
    ("kb:0330", "kerberos", "network authentication protocol", ()),
    ("kb:0331", "ipv6", "internet protocol version six", ()),
    ("kb:0332", "comma-separated values", "tabular text data format standard", ()),
    # ---- os / editors / cli tools ----------------------------------------
    ("kb:0333", "ubuntu", "linux distribution operating system", ()),
    ("kb:0334", "debian", "linux distribution operating system", ()),
    ("kb:0335", "fedora", "linux distribution operating system", ()),
    ("kb:0336", "alpine linux", "lightweight linux distribution system", ("alpine",)),
    ("kb:0337", "arch linux", "rolling release linux distribution system", ()),
    ("kb:0338", "windows", "desktop operating system", ()),
    ("kb:0339", "macos", "desktop operating system", ("osx", "mac os")),
    ("kb:0340", "freebsd", "unix-like operating system", ()),
    ("kb:0341", "android", "mobile operating system", ()),
    ("kb:0342", "ios", "mobile operating system", ()),
    ("kb:0343", "vim", "modal text editor tool", ()),
    ("kb:0344", "neovim", "extensible modal text editor tool", ("nvim",)),
    ("kb:0345", "emacs", "extensible text editor platform", ()),
    ("kb:0346", "visual studio code", "source code editor tool", ("vscode", "vs code", "vsc")),
    ("kb:0347", "intellij", "java integrated development environment tool", ("intellij idea",)),
    ("kb:0348", "pycharm", "python integrated development environment tool", ()),
    ("kb:0349", "sublime text", "source code editor tool", ()),
    ("kb:0350", "jupyter", "interactive notebook computing platform", ("jupyterlab", "jupyter notebook")),
    ("kb:0351", "xcode", "apple development environment tool", ()),
    ("kb:0352", "android studio", "android development environment tool", ()),
    ("kb:0353", "eclipse", "integrated development environment platform", ()),
    ("kb:0354", "tmux", "terminal multiplexer tool", ()),
    ("kb:0355", "zsh", "extended unix shell software", ()),
    ("kb:0356", "fish", "user-friendly command line shell software", ()),
    ("kb:0357", "curl", "data transfer command line tool", ()),
    ("kb:0358", "wget", "network file retrieval tool", ()),
    ("kb:0359", "jq", "json processing command line tool", ()),
    ("kb:0360", "sed", "stream editing tool", ()),
    ("kb:0361", "awk", "text processing language", ()),
    ("kb:0362", "grep", "text search tool", ()),
    ("kb:0363", "ripgrep", "fast recursive search tool", ("rg",)),
    ("kb:0364", "fzf", "fuzzy finder tool", ()),
    ("kb:0365", "htop", "interactive process viewer tool", ()),
    ("kb:0366", "strace", "system call tracing tool", ()),
    ("kb:0367", "gdb", "source-level debugger tool", ()),
    ("kb:0368", "valgrind", "memory debugging tool", ()),
    ("kb:0369", "wireshark", "network packet analysis tool", ()),
    ("kb:0370", "nmap", "network scanning tool", ()),
    ("kb:0371", "openssl", "cryptography toolkit library", ()),
    ("kb:0372", "rsync", "file synchronization tool", ()),
    ("kb:0373", "cron", "job scheduling service", ("crontab",)),
    ("kb:0374", "homebrew", "package manager tool for macos", ("brew",)),
    ("kb:0375", "apt", "debian package management tool", ()),
    ("kb:0376", "pacman", "arch linux package management tool", ()),
    ("kb:0377", "yarn", "javascript package manager tool", ()),
    ("kb:0378", "pnpm", "efficient javascript package manager tool", ()),
    ("kb:0379", "cargo", "rust package manager tool", ()),
    ("kb:0380", "nix", "declarative package management system", ("nixos",)),
    ("kb:0381", "chef", "configuration management tool", ()),
    ("kb:0382", "puppet", "configuration management tool", ()),
    ("kb:0383", "warp terminal", "modern terminal application", ()),
    ("kb:0384", "claude code", "agentic coding tool", ()),
    ("kb:0385", "chatgpt", "conversational ai application", ()),
    # ---- ml / ai entities -------------------------------------------------
    ("kb:0386", "machine learning", "statistical learning technology", ()),
    ("kb:0387", "artificial intelligence", "machine intelligence technology", ()),
    ("kb:0388", "deep learning", "neural network learning technology", ()),
    ("kb:0389", "neural network", "layered learning system", ()),
    ("kb:0390", "convolutional neural network", "image-oriented neural network system", ()),
    ("kb:0391", "recurrent neural network", "sequence-oriented neural network system", ()),
    ("kb:0392", "generative adversarial network", "generative neural network system", ()),
    ("kb:0393", "large language model", "text generation neural system", ()),
    ("kb:0394", "retrieval augmented generation", "retrieval-grounded generation technology", ()),
    ("kb:0395", "natural language processing", "text understanding technology", ()),
    ("kb:0396", "computer vision", "image understanding technology", ()),
    ("kb:0397", "knowledge graph", "graph-structured knowledge system", ()),
    ("kb:0398", "word2vec", "word embedding technique software", ()),
    ("kb:0399", "bert", "bidirectional transformer language model software", ()),
    ("kb:0400", "stable diffusion", "text-to-image generation software", ()),
    ("kb:0401", "whisper", "speech recognition software", ()),
    ("kb:0402", "vllm", "high-throughput llm inference library", ()),
    ("kb:0403", "ollama", "local model runner tool", ()),
    ("kb:0404", "langchain", "llm application framework", ()),
    ("kb:0405", "llamaindex", "llm data framework", ("llama index",)),
    ("kb:0406", "huggingface", "machine learning model platform", ("hugging face",)),
    ("kb:0407", "sentence transformers", "text embedding library", ("sbert",)),
    ("kb:0408", "onnx", "open neural network exchange format standard", ()),
    ("kb:0409", "tensorrt", "inference optimization library", ()),
    ("kb:0410", "mlflow", "machine learning lifecycle platform", ()),
    ("kb:0411", "kubeflow", "machine learning toolkit for kubernetes platform", ()),
    ("kb:0412", "ray", "distributed computing framework", ()),
    ("kb:0413", "dask", "parallel computing library", ()),
    ("kb:0414", "polars", "fast dataframe library", ()),
    # ---- concepts ---------------------------------------------------------
    ("kb:0415", "microservices", "distributed architecture style for services", ()),
    ("kb:0416", "serverless", "managed execution cloud technology", ()),
    ("kb:0417", "devops", "development and operations practice technology", ()),
    ("kb:0418", "continuous integration", "automated build and test practice technology", ("ci",)),
    ("kb:0419", "continuous deployment", "automated release practice technology", ("cd",)),
    ("kb:0420", "infrastructure as code", "declarative infrastructure practice", ("iac",)),
    ("kb:0421", "observability", "system behavior measurement technology", ()),
    ("kb:0422", "object-relational mapping", "database abstraction technique technology", ("orm",)),
    ("kb:0423", "model-view-controller", "software architecture pattern", ("mvc",)),
    ("kb:0424", "test-driven development", "test-first software practice", ("tdd",)),
    ("kb:0425", "extract transform load", "data pipeline technique technology", ("etl",)),
    ("kb:0426", "online analytical processing", "analytical database workload technology", ("olap",)),
    ("kb:0427", "online transaction processing", "transactional database workload technology", ("oltp",)),
    ("kb:0428", "event sourcing", "state-as-events persistence pattern technology", ()),
    ("kb:0429", "cqrs", "command query responsibility segregation pattern technology", ()),
    ("kb:0430", "domain-driven design", "model-centric software design practice", ("ddd",)),
    ("kb:0431", "dependency injection", "inversion of control technique technology", ()),
    ("kb:0432", "garbage collection", "automatic memory management technology", ()),
    ("kb:0433", "remote procedure call", "inter-process invocation protocol", ("rpc",)),
    ("kb:0434", "publish subscribe", "asynchronous messaging pattern technology", ("pubsub", "pub/sub")),
    ("kb:0435", "load balancing", "traffic distribution technology", ()),
    ("kb:0436", "sharding", "horizontal data partitioning technology", ()),
    ("kb:0437", "replication", "data redundancy technology", ()),
    ("kb:0438", "caching", "fast-access data storage technology", ()),
    ("kb:0439", "vector database", "similarity search database", ()),
    ("kb:0440", "data lake", "raw data storage repository system", ()),
    ("kb:0441", "data warehouse", "structured analytical storage system", ()),
    ("kb:0442", "data mesh", "decentralized data ownership architecture technology", ()),
    ("kb:0443", "feature store", "machine learning feature management system", ()),
    ("kb:0444", "a/b testing", "controlled experiment practice technology", ("ab testing",)),
    ("kb:0445", "progressive web app", "installable web application technology", ("pwa",)),
    ("kb:0446", "single sign-on", "unified authentication technology", ("sso",)),
    ("kb:0447", "identity and access management", "access control technology", ("iam",)),
    ("kb:0448", "virtual private cloud", "isolated cloud network infrastructure", ("vpc",)),
    ("kb:0449", "content delivery network", "distributed content caching infrastructure", ("cdn",)),
    ("kb:0450", "zero trust", "perimeterless security model technology", ()),
)


KB_SCHEMA = "kb_id string, kb_label string, description string, aliases array<string>"


def kb_df(spark: SparkSession, path: str | None = None) -> DataFrame:
    """The gazetteer dimension as a DataFrame (broadcast-sized).

    `path` (optional) loads an EXTERNAL KB dimension — a parquet table
    with the KB_SCHEMA columns — so deployments bring real gazetteer
    scale (the reference links against a 4,774-entity Wikidata slice,
    README.md:52-53; a production dimension is millions of rows) without
    code changes: every linker below broadcasts whatever dimension it is
    handed, and link cost stays flat in KB size until the broadcast limit,
    after which Spark falls back to a shuffle join on the same plan. With
    no path the curated in-code 450-entry dimension is returned."""
    if path is not None:
        df = spark.read.parquet(path)
        missing = {c for c in
                   ("kb_id", "kb_label", "description", "aliases")} - set(df.columns)
        if missing:
            raise ValueError(f"external KB at {path} lacks columns {sorted(missing)}")
        df = df.select("kb_id", "kb_label", "description", "aliases")
        # validate TYPES too, not just names: an aliases column that is a
        # csv string passes a name check and then fails deep inside the
        # linkers' explode — surface the contract violation at load time.
        # simpleString comparison deliberately ignores nullability.
        from pyspark.sql.types import StructType

        expected = StructType.fromDDL(KB_SCHEMA)
        for f in expected.fields:
            actual = df.schema[f.name].dataType
            if actual.simpleString() != f.dataType.simpleString():
                raise ValueError(
                    f"external KB at {path}: column {f.name} has type "
                    f"{actual.simpleString()}, expected {f.dataType.simpleString()}"
                )
        return df
    return spark.createDataFrame(
        [(k, lbl, d, list(a)) for k, lbl, d, a in KB_ENTRIES], KB_SCHEMA
    )


def _tech_keyword_hit(desc_col) -> "F.Column":
    low = F.lower(desc_col)
    hit = F.lit(False)
    for kw in TECH_KEYWORDS:
        hit = hit | low.contains(kw)
    return hit


def _match_dim(kb: DataFrame) -> DataFrame:
    """Exploded broadcast match dimension: one row per (match_key ->
    candidate), via exact label and via alias, with the candidate's
    tech-sense flag precomputed."""
    exact_side = kb.select(
        F.col("kb_label").alias("match_key"), "kb_id", "kb_label", "description",
        F.lit(False).alias("via_alias"),
    )
    alias_side = kb.select(
        F.explode("aliases").alias("match_key"), "kb_id", "kb_label", "description",
        F.lit(True).alias("via_alias"),
    )
    return exact_side.unionByName(alias_side).withColumn(
        "is_tech", _tech_keyword_hit(F.col("description"))
    )


def link_to_kb(
    labels: DataFrame,
    kb: DataFrame,
    label_col: str = "label",
    threshold: float = CONFIDENCE_THRESHOLD,
    cache: DataFrame | None = None,
    context: DataFrame | None = None,
) -> DataFrame:
    """Link distinct labels to the KB: (label, kb_id, kb_label,
    description, confidence, linked).

    Ladder (reference link_entities.py:528-536): candidate whose kb_label
    equals the query label -> 1.0; candidate found via alias whose
    description contains a tech keyword -> 0.8; other alias candidates ->
    0.5. Labels with no candidate get (NULL, 0.0, false) — a *recorded*
    negative decision, so the row also lands in the cache (negative
    caching, link_entities.py:308-311). `cache` rows (same schema) are
    reused verbatim and their labels skip the join entirely.

    `context` (optional) is a (label, context array<string>) DataFrame —
    the entity_context output (triples.py) keyed by the same label values.
    It never changes a candidate's ladder confidence; it re-ranks SAME-
    confidence candidates by evidence (domain agreement + description-word
    overlap) before the deterministic kb_id tie-break. With context=None
    the selection is exactly the context-free reference heuristic.
    """
    q = labels.select(F.lower(F.trim(F.col(label_col))).alias("label")).distinct()

    out_cols = ["label", "kb_id", "kb_label", "description", "confidence", "linked"]
    cached = None
    if cache is not None:
        cached = cache.select(*out_cols)
        q = q.join(cached.select("label"), "label", "left_anti")

    dim = F.broadcast(_match_dim(kb))

    if context is not None:
        ctx = context.select(
            F.lower(F.trim(F.col(label_col))).alias("label"),
            F.col("context").alias("context"),
        )
        q = q.join(ctx, "label", "left")
        # ctx_is_tech: does the context name any known tech entity?
        # (three-valued: true / false / NULL when the label has no context
        # rows at all — no evidence, selection falls back to kb_id order)
        tech_keys = dim.where(F.col("is_tech")).select("match_key").distinct()
        ctx_flags = (
            q.select("label", F.explode_outer("context").alias("__t"))
            .join(F.broadcast(tech_keys),
                  F.lower(F.col("__t")) == F.col("match_key"), "left")
            .groupBy("label")
            .agg(
                F.count("__t").alias("__n_ctx"),
                (F.sum(F.when(F.col("match_key").isNotNull(), 1).otherwise(0)) > 0
                 ).alias("__any_tech"),
            )
            .select(
                "label",
                F.when(F.col("__n_ctx") > 0, F.col("__any_tech")).alias("ctx_is_tech"),
            )
        )
        q = q.join(ctx_flags, "label", "left")
    else:
        q = q.withColumn("context", F.lit(None).cast("array<string>"))
        q = q.withColumn("ctx_is_tech", F.lit(None).cast("boolean"))

    cand = q.join(dim, q.label == dim.match_key, "left")
    conf = (
        F.when(F.col("match_key").isNull(), F.lit(0.0))
        .when(~F.col("via_alias"), F.lit(1.0))  # exact label match
        .when(F.col("is_tech"), F.lit(0.8))
        .otherwise(F.lit(0.5))
    )
    cand = cand.withColumn("confidence", conf)

    # evidence score (0 with no context — exactly the old ordering)
    desc_words = F.split(F.lower(F.col("description")), " ")
    ctx_words = F.split(F.lower(F.concat_ws(" ", F.col("context"))), " ")
    overlap = F.greatest(
        F.coalesce(F.size(F.array_intersect(ctx_words, desc_words)), F.lit(0)),
        F.lit(0),
    )
    agree = (
        F.when(F.col("ctx_is_tech").isNull(), F.lit(0))
        .when(F.col("ctx_is_tech") == F.col("is_tech"), F.lit(2))
        .otherwise(F.lit(0))
    )
    cand = cand.withColumn("ctx_score", agree + F.least(overlap, F.lit(3)))

    # best match per label: highest confidence, then strongest context
    # evidence, then lowest kb_id. r7: a min_by aggregate over an
    # ordering struct instead of the former row_number window — the
    # window shuffled every candidate row then sorted it; min_by
    # reduces map-side inside one exchange (guide §2.3/§2.4; A/B at
    # sf0.1 measured the two within noise — 1.01s vs 1.02s — the
    # aggregate form is kept for its map-side partial reduction, which
    # is what survives when candidate rows outgrow one task). The
    # ordering is the same total preference: ascending (-confidence,
    # -ctx_score, kb_id) == (desc confidence, desc ctx_score, asc
    # kb_id); kb_id is the KB primary key, so an exact ordering tie
    # implies the same candidate row and the winner is unique
    # (asc_nulls_last matched only the no-candidate case, where the
    # label has exactly one row and ordering is moot).
    best = (
        cand.groupBy("label")
        .agg(
            F.min_by(
                F.struct("kb_id", "kb_label", "description", "confidence"),
                F.struct(
                    (-F.col("confidence")).alias("nc"),
                    (-F.col("ctx_score")).alias("ns"),
                    F.col("kb_id").alias("kb_id"),
                ),
            ).alias("__b")
        )
        .select(
            "label",
            F.when(F.col("__b.confidence") >= threshold, F.col("__b.kb_id")).alias("kb_id"),
            F.when(F.col("__b.confidence") >= threshold, F.col("__b.kb_label")).alias("kb_label"),
            F.when(F.col("__b.confidence") >= threshold, F.col("__b.description")).alias("description"),
            F.col("__b.confidence").alias("confidence"),
            (F.col("__b.confidence") >= threshold).alias("linked"),
        )
    )
    if cached is not None:
        best = best.unionByName(cached)
    return best


def link_clusters(clusters: DataFrame, kb: DataFrame | None = None,
                  cache: DataFrame | None = None,
                  threshold: float = CONFIDENCE_THRESHOLD,
                  context: DataFrame | None = None) -> DataFrame:
    """Post-clustering link step (the reference pipeline order:
    link_entities runs over the resolved entity list, link_entities.py
    main flow): one row per cluster canonical label with its KB decision.

    `clusters` is ResolutionResult.clusters (label, cluster_id); the
    canonical label of a cluster is its cluster_id (min-label canonical),
    so linking runs once per CLUSTER, not once per surface form — at
    100TB the link join sees only distinct canonical labels.

    `context`: optional (canon_label, context) DataFrame — typically
    entity_context(mention_clusters-with-cluster_id-as-canon_label), the
    analog of the reference feeding extract_entity_contexts into the
    linker (link_entities.py:653-663)."""
    spark = clusters.sparkSession
    kb = kb if kb is not None else kb_df(spark)
    canon = clusters.select(F.col("cluster_id").alias("label")).distinct()
    ctx = None
    if context is not None:
        ctx = context.select(F.col("canon_label").alias("label"), "context")
    linked = link_to_kb(canon, kb, label_col="label", threshold=threshold,
                        cache=cache, context=ctx)
    return linked.withColumnRenamed("label", "cluster_id")


def same_as_edges(linked: DataFrame) -> DataFrame:
    """owl:sameAs-style output (label, same_as) for linked labels only
    (reference writes devkg entity owl:sameAs wd:QID)."""
    return (
        linked.where(F.col("linked"))
        .select("label", F.col("kb_id").alias("same_as"))
    )


def link_metrics(linked: DataFrame, cache: DataFrame | None = None) -> DataFrame:
    """A4-style run metrics for a link run (reference link_entities.py:
    760-786 prints total / linked / below-threshold / not-found / cache
    hits). Returns (status, n, share) rows with a deterministic status
    order; `cache` (if given) marks which output rows were cache reuses.

    status: 'linked' (confidence >= threshold), 'below_threshold'
    (candidate found but rejected), 'not_found' (no candidate at all),
    plus a 'cache_hit' row counting decisions served from the cache.
    """
    id_col = "cluster_id" if "cluster_id" in linked.columns else "label"
    status = (
        F.when(F.col("linked"), "linked")
        .when(F.col("confidence") > 0.0, "below_threshold")
        .otherwise("not_found")
    )
    base = linked.select(F.col(id_col).alias("label"), status.alias("status"))
    counts = base.groupBy("status").agg(F.count("*").alias("n"))
    if cache is not None:
        hits = (
            base.join(cache.select(F.lower(F.trim(F.col("label"))).alias("label"))
                      .distinct(), "label", "left_semi")
            .agg(F.count("*").alias("n"))
            .select(F.lit("cache_hit").alias("status"), "n")
        )
        counts = counts.unionByName(hits)
    total = linked.count()
    return (
        counts.withColumn("share", F.round(F.col("n") / F.lit(max(total, 1)), 4))
        .orderBy("status")
    )


def kb_enrichment(linked: DataFrame, kb: DataFrame) -> DataFrame:
    """Query-layer federated-enrichment analog (reference README.md:311-324
    ships SERVICE <wikidata> templates joining local entities to live KB
    descriptions/aliases): linked labels joined back to the broadcast KB
    dimension for description + alias list. Output one row per linked
    label: (label, kb_id, kb_label, description, aliases_csv)."""
    id_col = "cluster_id" if "cluster_id" in linked.columns else "label"
    dim = F.broadcast(kb.select(
        "kb_id",
        F.col("kb_label").alias("kb_label_e"),
        F.col("description").alias("description_e"),
        F.concat_ws(",", F.sort_array(F.col("aliases"))).alias("aliases_csv"),
    ))
    return (
        linked.where(F.col("linked"))
        .select(F.col(id_col).alias("label"), "kb_id")
        .join(dim, "kb_id")
        .select("label", "kb_id", F.col("kb_label_e").alias("kb_label"),
                F.col("description_e").alias("description"), "aliases_csv")
        .orderBy("label")
    )
