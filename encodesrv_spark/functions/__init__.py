# Submodules: hashing, scalars, text, argv. Import them directly —
# kept lazy here so partial builds and cheap imports stay possible.
