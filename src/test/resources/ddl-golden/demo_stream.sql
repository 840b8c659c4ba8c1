IF NOT EXISTS (SELECT 1 FROM sys.schemas WHERE name = N'sales')
    EXEC('CREATE SCHEMA [sales]');
GO
IF NOT EXISTS (SELECT 1 FROM sys.schemas WHERE name = N'audit')
    EXEC('CREATE SCHEMA [audit]');
GO
IF OBJECT_ID(N'sales.orders', N'U') IS NULL
BEGIN
CREATE TABLE [sales].[orders] (
    [order_id] int IDENTITY(1,1) NOT NULL,
    [customer_id] int NOT NULL,
    [order_date] datetime2 NOT NULL DEFAULT (getdate()),
    [status] nvarchar(20) NULL,
    [qty] int NOT NULL,
    [price] money NOT NULL,
    [total] AS ([qty]*[price]),
    [notes] nvarchar(max) NULL
);
END
GO
IF OBJECT_ID(N'sales.customers', N'U') IS NULL
BEGIN
CREATE TABLE [sales].[customers] (
    [customer_id] int IDENTITY(1000,1) NOT NULL,
    [name] nvarchar(100) NOT NULL,
    [email] varchar(255) NULL,
    [balance] decimal(18,2) NULL DEFAULT ((0.00)),
    [region_code] nchar(2) NULL,
    [created] date NOT NULL
);
END
GO
IF OBJECT_ID(N'sales.documents', N'U') IS NULL
BEGIN
CREATE TABLE [sales].[documents] (
    [doc_id] bigint NOT NULL,
    [title] nvarchar(200) NULL,
    [body] nvarchar(max) NULL,
    [blob] varbinary(max) NULL
);
END
GO
IF NOT EXISTS (SELECT 1 FROM sys.key_constraints WHERE name = N'PK_orders')
    ALTER TABLE [sales].[orders] ADD CONSTRAINT [PK_orders] PRIMARY KEY ([order_id]);
GO
IF NOT EXISTS (SELECT 1 FROM sys.key_constraints WHERE name = N'PK_customers')
    ALTER TABLE [sales].[customers] ADD CONSTRAINT [PK_customers] PRIMARY KEY ([customer_id]);
GO
IF NOT EXISTS (SELECT 1 FROM sys.key_constraints WHERE name = N'PK_documents')
    ALTER TABLE [sales].[documents] ADD CONSTRAINT [PK_documents] PRIMARY KEY ([doc_id]);
GO
IF NOT EXISTS (SELECT 1 FROM sys.key_constraints WHERE name = N'UQ_customers_email')
    ALTER TABLE [sales].[customers] ADD CONSTRAINT [UQ_customers_email] UNIQUE ([email], [region_code]);
GO
IF NOT EXISTS (SELECT 1 FROM sys.check_constraints WHERE name = N'CK_orders_qty')
    ALTER TABLE [sales].[orders] ADD CONSTRAINT [CK_orders_qty] CHECK ([qty]>(0));
GO
IF NOT EXISTS (SELECT 1 FROM sys.foreign_keys WHERE name = N'FK_orders_customers')
    ALTER TABLE [sales].[orders] ADD CONSTRAINT [FK_orders_customers] FOREIGN KEY ([customer_id]) REFERENCES [sales].[customers] ([customer_id]);
GO
IF NOT EXISTS (SELECT 1 FROM sys.foreign_keys WHERE name = N'FK_orders_to_customers_orders_to_customers_orders_to_customers_orders_to_customers_orders_to_customers_orders_to_custome249ba02a')
    ALTER TABLE [sales].[orders] ADD CONSTRAINT [FK_orders_to_customers_orders_to_customers_orders_to_customers_orders_to_customers_orders_to_customers_orders_to_custome249ba02a] FOREIGN KEY ([customer_id], [status]) REFERENCES [sales].[customers] ([customer_id], [region_code]);
GO
IF NOT EXISTS (SELECT 1 FROM sys.indexes WHERE name = N'IX_orders_date' AND object_id = OBJECT_ID(N'sales.orders'))
    CREATE NONCLUSTERED INDEX [IX_orders_date] ON [sales].[orders] ([order_date]) INCLUDE ([status], [total]) WHERE ([status] IS NOT NULL);
GO
IF NOT EXISTS (SELECT 1 FROM sys.indexes WHERE name = N'CIX_customers_created' AND object_id = OBJECT_ID(N'sales.customers'))
    CREATE UNIQUE CLUSTERED INDEX [CIX_customers_created] ON [sales].[customers] ([created], [customer_id]);
GO
IF NOT EXISTS (SELECT 1 FROM sys.fulltext_catalogs WHERE name = N'SearchCat')
BEGIN
    CREATE FULLTEXT CATALOG [SearchCat]
END
GO
IF NOT EXISTS (SELECT 1 FROM sys.fulltext_catalogs WHERE is_default = 1)
BEGIN
    CREATE FULLTEXT CATALOG DefaultFullTextCatalog AS DEFAULT;
END
GO
IF NOT EXISTS (SELECT 1 FROM sys.fulltext_indexes WHERE object_id = OBJECT_ID(N'sales.documents'))
BEGIN
    CREATE FULLTEXT INDEX ON [sales].[documents] ([title], [body]) KEY INDEX [PK_documents] ON [SearchCat];
END
GO
IF OBJECT_ID(N'sales.trg_orders_audit', N'TR') IS NULL
BEGIN
EXEC('CREATE TRIGGER trg_orders_audit ON sales.orders AFTER INSERT AS
INSERT INTO audit.log(msg) SELECT ''GO fast: order '' + CAST(i.order_id AS varchar(12)) FROM inserted i');
END
GO
IF OBJECT_ID(N'sales.trg_customers_freeze', N'TR') IS NULL
BEGIN
EXEC('CREATE TRIGGER trg_customers_freeze ON sales.customers AFTER DELETE AS ROLLBACK');
END
GO
DISABLE TRIGGER [trg_customers_freeze] ON [sales].[customers];
GO
