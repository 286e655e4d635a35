// Audio preview widgets for rvc_tpu nodes (counterpart of the reference's
// web/js/ui_handlers.js): attaches an <audio> element to nodes that return
// AUDIO previews.
import { app } from "../../scripts/app.js";
import { api } from "../../scripts/api.js";

function addPreviewWidget(node, audioUrl) {
    const existing = node.widgets?.find((w) => w.name === "rvc_audio_preview");
    if (existing) {
        existing.audioEl.src = audioUrl;
        return existing;
    }
    const el = document.createElement("audio");
    el.controls = true;
    el.src = audioUrl;
    el.style.width = "100%";
    const widget = node.addDOMWidget("rvc_audio_preview", "audio", el, {
        serialize: false,
    });
    widget.audioEl = el;
    node.setSize([node.size[0], node.computeSize()[1]]);
    return widget;
}

// ---- file upload widgets (counterpart of reference ui_handlers.js
// uploadFile/addUploadWidget, :149-290) -------------------------------------

// MIME accept-lists per upload kind; subfolder = server-side input subdir
const UPLOAD_KINDS = {
    audio: {
        accept: "audio/mpeg,audio/wav,audio/x-wav,audio/ogg,audio/flac",
        subfolder: "audio",
    },
    zip: { accept: "application/zip", subfolder: "datasets" },
    weights: { accept: ".pth,.ckpt,.safetensors,.onnx,.npy,.index", subfolder: "models" },
};

// which nodes get an upload button, and which STRING widget receives the path
const UPLOAD_TARGETS = {
    RVC_TPU_LoadAudio: { widget: "path", kind: "audio" },
    RVC_TPU_ProcessDataset: { widget: "input_dir", kind: "zip" },
    RVC_TPU_LoadRVCModel: { widget: "model_path", kind: "weights" },
    RVC_TPU_LoadHubert: { widget: "model_path", kind: "weights" },
};

async function uploadToServer(file, subfolder) {
    const body = new FormData();
    body.append("image", new File([file], file.name, { type: file.type }));
    if (subfolder) body.append("subfolder", subfolder);
    const resp = await api.fetchApi("/upload/image", { method: "POST", body });
    if (resp.status !== 200) {
        alert(`upload failed: ${resp.status} ${resp.statusText}`);
        return null;
    }
    return subfolder ? `${subfolder}/${file.name}` : file.name;
}

function attachUploadButton(node, widgetName, kind) {
    const pathWidget = node.widgets?.find((w) => w.name === widgetName);
    if (!pathWidget) return;
    const spec = UPLOAD_KINDS[kind];
    const input = document.createElement("input");
    Object.assign(input, {
        type: "file",
        accept: spec.accept,
        style: "display: none",
        onchange: async () => {
            if (!input.files.length) return;
            const name = await uploadToServer(input.files[0], spec.subfolder);
            if (name == null) return;
            pathWidget.value = name;
            pathWidget.callback?.(name);
            if (kind === "audio") {
                const url = api.apiURL(
                    `/view?filename=${encodeURIComponent(input.files[0].name)}` +
                    `&type=input&subfolder=${spec.subfolder}`
                );
                addPreviewWidget(node, url);
            }
        },
    });
    document.body.append(input);
    const btn = node.addWidget("button", `upload ${kind}`, "upload", () => {
        app.canvas.node_widget = null; // release focus before the dialog
        input.click();
    });
    btn.options.serialize = false;
    const onRemoved = node.onRemoved;
    node.onRemoved = function () {
        input.remove();
        onRemoved?.apply(this, arguments);
    };
}

app.registerExtension({
    name: "rvc_tpu.audio_preview",
    async beforeRegisterNodeDef(nodeType, nodeData) {
        if (!nodeData.name?.startsWith("RVC_TPU_")) return;
        const onExecuted = nodeType.prototype.onExecuted;
        nodeType.prototype.onExecuted = function (message) {
            onExecuted?.apply(this, arguments);
            const preview = message?.preview?.[0];
            if (preview) {
                const url = api.apiURL(
                    `/view?filename=${encodeURIComponent(preview.filename)}` +
                    `&type=${preview.type || "output"}&subfolder=${preview.subfolder || ""}`
                );
                const widget = addPreviewWidget(this, url);
                if (preview.autoplay) widget.audioEl.play?.();
            }
        };
        const target = UPLOAD_TARGETS[nodeData.name];
        if (target) {
            const onNodeCreated = nodeType.prototype.onNodeCreated;
            nodeType.prototype.onNodeCreated = function () {
                onNodeCreated?.apply(this, arguments);
                attachUploadButton(this, target.widget, target.kind);
            };
        }
    },
});
