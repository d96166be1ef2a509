# r4w-tpu container image (role of the reference Dockerfile:1-20 —
# multi-stage build to a minimal runtime with the CLI as entrypoint).
#
#   docker build -t r4w-tpu .                  # CPU image
#   docker build --build-arg JAX_EXTRA=tpu -t r4w-tpu:tpu .
#   docker run --rm r4w-tpu waveform --list
#   docker run --rm -p 8080:8080 r4w-tpu explore --host 0.0.0.0

FROM python:3.12-slim AS build
ARG JAX_EXTRA=cpu
WORKDIR /src
COPY r4w_tpu/ r4w_tpu/
COPY specs/ specs/
COPY README.md .
RUN pip install --no-cache-dir --prefix=/install \
        "jax[${JAX_EXTRA}]" numpy matplotlib pyyaml cryptography

FROM python:3.12-slim
COPY --from=build /install /usr/local
COPY --from=build /src/r4w_tpu /opt/r4w/r4w_tpu
COPY --from=build /src/specs /opt/r4w/specs
ENV PYTHONPATH=/opt/r4w \
    JAX_PLATFORMS=""
WORKDIR /opt/r4w
ENTRYPOINT ["python", "-m", "r4w_tpu.cli"]
CMD ["--help"]
